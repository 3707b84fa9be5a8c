"""Fleet-wide exchange-width derivation.

Every manual exchange in the engine (the uniqueness pre-aggregation,
dedup's bucketed pair generation, the as-of/range/session key-hash
exchanges, validate's raw-task uniqueness exchange) keys rows into P
coarse partitions. P used to be a single-node constant (32); at
cluster scale it must grow with input size or per-partition memory
explodes. :func:`exchange_width` derives P from the pipeline's input
size using PLAN METADATA ONLY — it never executes the dataset:

* a dataset with file provenance (``read_parquet`` etc.) contributes
  its on-disk bytes × ``DECODE_INFLATION`` (decoded Arrow is ~4× a
  compressed parquet footprint);
* an already-materialized dataset contributes its exact in-memory
  bytes (free — the blocks are counted);
* a derived, un-executed dataset contributes 0 (its provenance is the
  caller's responsibility: pass the SOURCE dataset too).

Width = ceil(estimated_bytes / TARGET_PARTITION_BYTES), floored at
``MIN_PARTITIONS`` so small inputs still spread across the node.
Override precedence: explicit ``override`` argument >
``DATA_LINTER_RAY_SHUFFLE_PARTITIONS`` env var > derivation.
"""

from __future__ import annotations

import math
import os

#: floor — small inputs still fan out across one node's cores
MIN_PARTITIONS = 32
#: target decoded bytes per exchange partition (≈1 GiB: fits a worker
#: heap with headroom for the per-partition pandas merge)
TARGET_PARTITION_BYTES = 1 << 30
#: decoded-Arrow bytes per on-disk parquet byte (measured ~3-4× on the
#: test corpus; erring high only adds partitions, never memory)
DECODE_INFLATION = 4
ENV_VAR = "DATA_LINTER_RAY_SHUFFLE_PARTITIONS"


def exchange_width(*datasets, override: int | None = None, floor: int | None = None) -> int:
    """Partition count for a manual hash exchange over ``datasets``."""
    if override:
        return int(override)
    env = os.environ.get(ENV_VAR)
    if env:
        return int(env)
    lo = floor or MIN_PARTITIONS
    total = sum(_estimated_bytes(ds) for ds in datasets)
    if total <= 0:
        return lo
    return max(lo, math.ceil(total / TARGET_PARTITION_BYTES))


def join_width(*datasets, override: int | None = None) -> int:
    """Partition count for Ray Data's HASH JOIN (``Dataset.join``).

    Unlike the manual task-based exchanges, the hash join schedules one
    aggregator ACTOR per partition — a width beyond the cluster's CPU
    count deadlocks the streaming executor (the pool can never acquire
    its actors), and every actor costs real startup (~100-200 ms each,
    measured: a 32-actor pool adds ~5 s to a small join). So the floor
    is 2, not MIN_PARTITIONS: width grows with DATA
    (:func:`exchange_width` bytes derivation), never with the idle CPU
    count, and is capped at the cluster CPUs."""
    if override:
        return int(override)
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(exchange_width(*datasets, floor=2), cpus))


def _estimated_bytes(ds) -> int:
    # materialized datasets know their exact in-memory size for free
    if type(ds).__name__ == "MaterializedDataset":
        try:
            return int(ds.size_bytes() or 0)
        except Exception:
            return 0
    # otherwise: file provenance only — input_files() is plan metadata
    # (returns [] for derived datasets); size_bytes() on a lazy dataset
    # would EXECUTE it, so it is never called here
    try:
        files = ds.input_files()
    except Exception:
        return 0
    from data_linter_ray import fs

    total = 0
    for f in files:
        try:
            total += fs.size(f)
        except Exception:
            pass
    return total * DECODE_INFLATION


def keyed_scatter_gather(mat, part_col: str, num_partitions: int, reduce_fn):
    """Manual hash exchange: scatter a MATERIALIZED dataset's blocks by
    an int64 partition column in [0, num_partitions), gather each
    partition in one reduce task, return the reduced blocks as a new
    Dataset (``from_arrow_refs`` — nothing lands on the driver).

    Why not ``groupby(part_col).map_groups``: Ray Data's sort-based
    groupby samples key values to pick reduce boundaries; any key
    holding more than 1/P of the mass duplicates a sampled boundary and
    yields empty, schema-less sort partitions (executor warns, dataset
    schema degrades) — and the sample+sort passes cost real time. This
    exchange is deterministic: partition i IS key i. All tasks are pure
    functions of their inputs, so lineage-based retry holds.

    ``reduce_fn(part_index, table) -> table`` runs once per partition
    and MUST return a consistently-typed table even for empty input
    (pin the schema — mixed block schemas bite downstream consumers).
    """
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    P = int(num_partitions)

    def _scatter(*tables):
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        pv = t[part_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(pv, kind="stable")
        st = t.take(pa.array(order))
        bounds = np.searchsorted(pv[order], np.arange(P + 1))
        out = [st.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(P)]
        return out[0] if P == 1 else tuple(out)

    def _reduce(i, *parts):
        parts = [p for p in parts if p.num_rows]
        if not parts:
            merged = None
        elif len(parts) == 1:
            merged = parts[0]
        else:
            merged = pa.concat_tables(parts)
        return reduce_fn(i, merged)

    scatter_task = ray.remote(_scatter)
    reduce_task = ray.remote(_reduce)

    block_refs = [
        r for bundle in mat.iter_internal_ref_bundles() for r in bundle.block_refs
    ]
    if not block_refs:
        return rd.from_arrow_refs([reduce_task.remote(0)])
    # group blocks so scatter-task (and returned-ref) count stays ~2×P
    group = max(1, len(block_refs) // (2 * P))
    groups = [block_refs[i : i + group] for i in range(0, len(block_refs), group)]
    per_block = [
        scatter_task.options(num_returns=P).remote(*g) if P > 1
        else [scatter_task.remote(*g)]
        for g in groups
    ]
    reduced = [
        reduce_task.remote(p, *[pb[p] for pb in per_block]) for p in range(P)
    ]
    return rd.from_arrow_refs(reduced)
