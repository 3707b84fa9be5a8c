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

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from data_linter_ray.checks import UNIQUE_TEST
from data_linter_ray.stages.checker import VIOLATION_SCHEMA, _stringify


def _local_counts(key: str):
    def fn(batch: pa.Table) -> pa.Table:
        vc = batch[key].combine_chunks().value_counts()
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=[key, "n"],
        )

    return fn


def duplicate_keys(ds: Dataset, key: str) -> Dataset:
    """Dataset of ``(key, n)`` rows where ``n > 1`` (global duplicates)."""
    pre = ds.select_columns([key]).map_batches(
        _local_counts(key), batch_format="pyarrow"
    )
    agg = pre.groupby(key).aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
    )


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
