"""Referential-integrity check (north-rule extension).

FK column ⊆ PK set of a reference table. Two physical strategies
(SURVEY.md §2.4, §7.3):

- **broadcast** (default for small dimension tables): the distinct PK set
  is collected once, ``ray.put`` into the object store, and every check
  task reads it zero-copy for a vectorized ``pc.is_in`` — no shuffle, and
  the set ships to each node once rather than per batch.
- **shuffle** (large dimensions): a hash-partitioned anti-join expressed as
  union-of-tagged-partials → ``groupby(key).aggregate`` — both sides are
  pre-aggregated per batch first so only (key, count/flag) pairs shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Max, Sum

from data_linter_ray.checks import REFERENTIAL_TEST
from data_linter_ray.stages.checker import VIOLATION_SCHEMA, _stringify

# dimension tables smaller than this (rows) are broadcast
BROADCAST_ROW_THRESHOLD = 10_000_000


class _BroadcastAntiJoin:
    """Actor-pool / task callable: holds the PK-set object ref; Ray
    dereferences it once per task from the local object store."""

    def __init__(self, fk: str, id_column: str | None, pk_set_ref):
        self.fk = fk
        self.id_column = id_column
        self.pk_set_ref = pk_set_ref
        self._pk_set = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._pk_set is None:
            obj = self.pk_set_ref
            self._pk_set = ray.get(obj) if isinstance(obj, ray.ObjectRef) else obj
        col = batch[self.fk].combine_chunks()
        dangling = pc.and_(
            pc.invert(pc.fill_null(pc.is_in(col, value_set=self._pk_set), False)),
            pc.invert(pc.is_null(col)),  # null FKs are the nullable test's job
        )
        n = pc.sum(dangling).as_py() or 0
        if n == 0:
            return VIOLATION_SCHEMA.empty_table()
        if self.id_column and self.id_column in batch.column_names:
            refs = _stringify(pc.filter(batch[self.id_column].combine_chunks(), dangling))
        else:
            refs = pa.nulls(n, type=pa.string())
        return pa.Table.from_arrays(
            [
                refs,
                pa.array([self.fk] * n, type=pa.string()),
                pa.array([REFERENTIAL_TEST] * n, type=pa.string()),
                _stringify(pc.filter(col, dangling)),
            ],
            schema=VIOLATION_SCHEMA,
        )


def referential_violations_broadcast(
    ds: Dataset,
    fk: str,
    ref_ds: Dataset,
    pk: str,
    id_column: str | None = None,
) -> Dataset:
    """Broadcast strategy: distinct PK values → object store → pc.is_in."""
    # distinct via two-level agg so only uniques leave each block
    distinct = (
        ref_ds.select_columns([pk])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t[pk].combine_chunks().unique()], names=[pk]
            ),
            batch_format="pyarrow",
        )
        .unique(pk)
    )
    pk_values = pa.array(distinct, type=ref_ds.schema().base_schema.field(pk).type)
    pk_ref = ray.put(pk_values)
    return ds.map_batches(
        _BroadcastAntiJoin(fk, id_column, pk_ref), batch_format="pyarrow"
    )


def referential_violations_shuffle(
    ds: Dataset, fk: str, ref_ds: Dataset, pk: str
) -> Dataset:
    """Shuffle strategy: pre-aggregated tagged union → groupby anti-join.

    Emits (key, n) violations — row-level addressing would need a second
    join; at dimension sizes that force this path, key-level reporting is
    the scalable contract.
    """

    def fk_partials(t: pa.Table) -> pa.Table:
        vc = t[fk].combine_chunks().drop_null().value_counts()
        k = vc.field("values")
        return pa.Table.from_arrays(
            [k, pc.cast(vc.field("counts"), pa.int64()),
             pa.nulls(len(k), pa.int64())],
            names=["key", "n_fk", "has_pk"],
        )

    def pk_partials(t: pa.Table) -> pa.Table:
        k = t[pk].combine_chunks().unique()
        return pa.Table.from_arrays(
            [k, pa.nulls(len(k), pa.int64()),
             pa.array([1] * len(k), type=pa.int64())],
            names=["key", "n_fk", "has_pk"],
        )

    tagged = ds.select_columns([fk]).map_batches(
        fk_partials, batch_format="pyarrow"
    ).union(
        ref_ds.select_columns([pk]).map_batches(pk_partials, batch_format="pyarrow")
    )
    joined = tagged.groupby("key").aggregate(
        Sum("n_fk", alias_name="n_fk", ignore_nulls=True),
        Max("has_pk", alias_name="has_pk", ignore_nulls=True),
    )

    def dangling(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.fill_null(pc.equal(pc.fill_null(t["has_pk"], 0), 0), False),
            pc.fill_null(pc.greater(t["n_fk"], 0), False),
        )
        sub = t.filter(mask)
        n = sub.num_rows
        return pa.Table.from_arrays(
            [
                pa.nulls(n, pa.string()),
                pa.array([fk] * n, type=pa.string()),
                pa.array([REFERENTIAL_TEST] * n, type=pa.string()),
                _stringify(sub["key"].combine_chunks()),
            ],
            schema=VIOLATION_SCHEMA,
        )

    return joined.map_batches(dangling, batch_format="pyarrow")


def referential_violations(
    ds: Dataset,
    fk: str,
    ref_ds: Dataset,
    pk: str,
    id_column: str | None = None,
    broadcast_threshold: int = BROADCAST_ROW_THRESHOLD,
) -> Dataset:
    """Pick broadcast vs shuffle by dimension size (parquet metadata count
    is cheap — no scan)."""
    if ref_ds.count() <= broadcast_threshold:
        return referential_violations_broadcast(ds, fk, ref_ds, pk, id_column)
    return referential_violations_shuffle(ds, fk, ref_ds, pk)
