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
