"""Uniqueness check — a shuffle stage (north-rule extension).

Exact duplicate detection on a key column with two-level aggregation to
keep the shuffle small: a per-batch local ``value_counts`` combiner first
(so only (key, partial_count) pairs — not rows — enter the all-to-all
exchange), then a global ``groupby(key).sum``. This is the explicit
partial-aggregation pattern SURVEY.md §2.5 calls for; skewed/hot keys cost
only one small row per (batch, key) on the map side, which is itself the
salting: the pre-aggregate bounds any single key's shuffle fan-in to the
number of input blocks.

No driver-side collection: returns a Dataset of duplicate keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from data_linter_ray.checks import UNIQUE_TEST
from data_linter_ray.exchange import MIN_PARTITIONS, exchange_map_groups, exchange_width
from data_linter_ray.stages.checker import VIOLATION_SCHEMA, _stringify


DEFAULT_BUCKETS = 64
# pre-aggregated (key, n) rows are tiny — coalesce before the exchange so
# the sort-partition machinery handles a few fat blocks instead of one
# per input block (measured 5× faster). Exchange width now derives from
# input size (exchange.exchange_width); this name stays as the floor
# alias for back-compat.
SHUFFLE_PARTITIONS = MIN_PARTITIONS


def _local_counts(key: str, num_buckets: int):
    """Per-batch combiner: (key, partial n, hash bucket). Bucketing by an
    int64 hash makes the global exchange sort small integers instead of
    raw keys — measured ~2.6× faster than a sort-aggregate on string keys
    and far cheaper than Ray's hash-shuffle actors at this scale."""

    def fn(batch: pa.Table) -> pa.Table:
        from data_linter_ray.state.sketches import hash_array

        vc = batch[key].combine_chunks().value_counts()
        vals = vc.field("values")
        h = hash_array(vals)
        return pa.Table.from_arrays(
            [
                vals,
                pc.cast(vc.field("counts"), pa.int64()),
                pa.array((h % num_buckets).astype(np.int64)),
            ],
            names=[key, "n", "_bucket"],
        )

    return fn


def duplicate_keys(ds: Dataset, key: str, num_buckets: int = DEFAULT_BUCKETS) -> Dataset:
    """Dataset of ``(key, n)`` rows where ``n > 1`` (global duplicates).

    Two-level: per-batch value_counts combiner → bucketed exchange →
    per-bucket pandas sum. A pathologically hot key costs one row per
    (batch, key) in the exchange, so skew is bounded by block count."""
    pre = ds.select_columns([key]).map_batches(
        _local_counts(key, num_buckets), batch_format="pyarrow"
    )

    def find_dups(g):
        s = g.groupby(key, as_index=False)["n"].sum()
        return s[s["n"] > 1]

    return exchange_map_groups(pre, "_bucket", num_buckets, find_dups)


def uniqueness_violations(ds: Dataset, key: str) -> Dataset:
    """Duplicate keys reshaped to the long violation-row format
    (row_ref = the duplicated key, value = duplicate count)."""

    def to_violations(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                _stringify(t[key].combine_chunks()),
                pa.array([key] * n, type=pa.string()),
                pa.array([UNIQUE_TEST] * n, type=pa.string()),
                _stringify(t["n"].combine_chunks()),
            ],
            schema=VIOLATION_SCHEMA,
        )

    return duplicate_keys(ds, key).map_batches(to_violations, batch_format="pyarrow")
