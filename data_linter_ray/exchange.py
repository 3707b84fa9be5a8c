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


def keyed_scatter_gather(
    mat,
    part_col: str,
    num_partitions: int,
    reduce_fn,
    *,
    skip_empty: bool = False,
    empty_schema=None,
):
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

    With ``skip_empty=True`` the scatter side also returns a per-
    partition row-count vector (one extra tiny return per scatter task,
    the ``_split_preagg_block`` P+1 pattern); the driver folds the
    counts and schedules reduce tasks ONLY for non-empty partitions, so
    ``reduce_fn`` never sees empty input and needs no pinned empty
    schema. An all-empty exchange returns an empty zero-column dataset.

    Width scaling: blocks are grouped so at most ~2P scatter tasks run,
    each returning P objects — object-count is O(P²), fine at the
    bytes-derived widths this engine uses (P ≈ input/1 GiB; P=1000 →
    2M object-store entries across a fleet). Per-task memory is
    bounded: a scatter task holds ~1/(2P) of the input, a reduce task
    holds exactly one partition (~1/P).
    """
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    P = int(num_partitions)

    def _scatter(*tables):
        # Ray Data passes empty blocks through map_batches WITHOUT
        # calling the UDF, so an empty block can carry a stale upstream
        # schema (even missing part_col). Empty parts are dropped by
        # the reduce side regardless, so skip empty inputs wholesale.
        tables = [t for t in tables if t.num_rows]
        if not tables:
            out = [pa.table({})] * P
            if skip_empty:
                out.append(np.zeros(P, np.int64))
            return out[0] if len(out) == 1 else tuple(out)
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        pv = t[part_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(pv, kind="stable")
        st = t.take(pa.array(order))
        bounds = np.searchsorted(pv[order], np.arange(P + 1))
        out = [st.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(P)]
        if skip_empty:
            out.append(np.diff(bounds).astype(np.int64))
        return out[0] if len(out) == 1 else tuple(out)

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
        if skip_empty:
            return rd.from_arrow(
                empty_schema.empty_table() if empty_schema is not None else pa.table({})
            )
        return rd.from_arrow_refs([reduce_task.remote(0)])
    # group blocks so scatter-task (and returned-ref) count stays ~2×P
    group = max(1, len(block_refs) // (2 * P))
    groups = [block_refs[i : i + group] for i in range(0, len(block_refs), group)]
    n_ret = P + 1 if skip_empty else P
    per_block = [
        scatter_task.options(num_returns=n_ret).remote(*g) if n_ret > 1
        else [scatter_task.remote(*g)]
        for g in groups
    ]
    live = range(P)
    if skip_empty:
        counts = np.sum(ray.get([pb[P] for pb in per_block]), axis=0)
        live = [p for p in range(P) if counts[p] > 0]
        if not live:
            return rd.from_arrow(
                empty_schema.empty_table() if empty_schema is not None else pa.table({})
            )
    reduced = [
        reduce_task.remote(p, *[pb[p] for pb in per_block]) for p in live
    ]
    return rd.from_arrow_refs(reduced)


def exchange_map_groups(
    ds,
    part_col: str,
    num_partitions: int,
    fn,
    *,
    batch_format: str = "pandas",
    empty_schema=None,
):
    """Drop-in replacement for ``ds.groupby(part_col).map_groups(fn,
    batch_format=...)`` over a dense int partition column: one
    deterministic :func:`keyed_scatter_gather` exchange, ``fn`` applied
    to each non-empty partition as a pandas DataFrame (or a pyarrow
    Table with ``batch_format="pyarrow"``; ``part_col`` still present,
    as with map_groups). No boundary sampling, no sort, no empty
    schema-less partitions."""
    import pyarrow as pa

    def reduce(i, t):
        out = fn(t.to_pandas() if batch_format == "pandas" else t)
        if not isinstance(out, pa.Table):
            out = pa.Table.from_pandas(out, preserve_index=False)
        # pandas metadata makes pa.Schema unhashable (upstream warning
        # noise) and serves no downstream purpose here
        return out.replace_schema_metadata(None)

    mat = ds if type(ds).__name__ == "MaterializedDataset" else ds.materialize()
    return keyed_scatter_gather(
        mat, part_col, num_partitions, reduce, skip_empty=True,
        empty_schema=empty_schema,
    )
