"""The stateless per-batch check stage.

A ``CheckPlan`` is compiled ONCE on the driver from a
:class:`~data_linter_ray.metadata.TableSchema` against the dataset's actual
Arrow schema — the compile-time equivalent of the reference's runtime
dispatch gate (``/root/reference/data_linter/validators/pandas_validator.py:141-207``).
A ``BatchChecker`` then runs inside ``ds.map_batches(...,
batch_format="pyarrow")``: pure Arrow kernels per batch, emitting
**long-format violation rows** — never whole-column results — so the
pipeline streams and nothing is collected on the driver.

Violation row schema:
    row_ref : string  — the configured id column's value (e.g. doc_id),
                        or null when no id column is configured
    column  : string  — checked column name
    test    : string  — test name (reference-parity names, checks.py)
    value   : string  — stringified offending value (reference
                        ``_fill_res_dict`` stringifies samples the same way)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from data_linter_ray import checks
from data_linter_ray.metadata import ColumnSpec, TableSchema

VIOLATION_SCHEMA = pa.schema(
    [
        ("row_ref", pa.string()),
        ("column", pa.string()),
        ("test", pa.string()),
        ("value", pa.string()),
    ]
)


@dataclass
class CheckPlan:
    """Static list of (column, test, spec) tasks + alignment decisions."""

    tasks: list[tuple[str, str, ColumnSpec]] = field(default_factory=list)
    id_column: Optional[str] = None
    # columns present in metadata but not data / vice versa (M3 diagnostics)
    cols_in_meta_not_in_data: list[str] = field(default_factory=list)
    cols_in_data_not_in_meta: list[str] = field(default_factory=list)
    # columns the checker actually needs to read (for column pruning)
    @property
    def input_columns(self) -> list[str]:
        cols = {c for c, _, _ in self.tasks}
        if self.id_column:
            cols.add(self.id_column)
        return sorted(cols)


def compile_plan(
    schema: TableSchema,
    data_schema: pa.Schema,
    id_column: Optional[str] = None,
    allow_missing_cols: bool = False,
    allow_unexpected_data: bool = False,
) -> CheckPlan:
    """Compile the check plan, applying the reference's column-alignment
    policy (``pandas_validator.py:436-472``):

      - meta∖data columns: dropped from the plan iff ``allow_missing_cols``,
        else a ``ColumnError``-equivalent is raised by the caller via the
        recorded diff;
      - data∖meta columns: ignored (projection) iff ``allow_unexpected_data``;
      - zero overlap always raises.
    """
    data_cols = set(data_schema.names)
    meta_cols = [c.name for c in schema.columns]
    missing = [c for c in meta_cols if c not in data_cols]
    unexpected = [c for c in data_cols if c not in meta_cols]
    overlap = [c for c in meta_cols if c in data_cols]

    plan = CheckPlan(
        id_column=id_column,
        cols_in_meta_not_in_data=missing,
        cols_in_data_not_in_meta=unexpected,
    )
    if not overlap:
        raise ColumnAlignmentError(
            "No overlap between metadata columns and data columns "
            f"(meta: {meta_cols}, data: {sorted(data_cols)})"
        )
    errors = []
    if missing and not allow_missing_cols:
        errors.append(f"Columns in metadata missing from data: {missing}")
    if unexpected and not allow_unexpected_data:
        errors.append(f"Unexpected columns in data not in metadata: {unexpected}")
    if errors:
        raise ColumnAlignmentError("; ".join(errors))

    for spec in schema.columns:
        if spec.name not in data_cols:
            continue
        arrow_t = data_schema.field(spec.name).type
        for test in checks.applicable_tests(spec, arrow_t):
            plan.tasks.append((spec.name, test, spec))
    return plan


class ColumnAlignmentError(Exception):
    """Reference parity: ``ColumnError`` (pandas_validator.py:26)."""


def _stringify(arr: pa.Array) -> pa.Array:
    """Cast offending values to string the way pandas ``.astype(str)`` does
    (close enough for parity: str() of the python value)."""
    try:
        return pc.cast(arr, pa.string())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return pa.array([str(v) for v in arr.to_pylist()], type=pa.string())


class BatchChecker:
    """Callable for ``ds.map_batches(BatchChecker(plan),
    batch_format="pyarrow")`` — plain function semantics (stateless), but
    written as a class so the compiled plan ships once per task rather than
    per batch closure."""

    def __init__(self, plan: CheckPlan):
        self.plan = plan

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs: list[pa.Array] = []
        cols: list[pa.Array] = []
        tests: list[pa.Array] = []
        values: list[pa.Array] = []
        id_col = (
            _stringify(batch[self.plan.id_column].combine_chunks())
            if self.plan.id_column and self.plan.id_column in batch.column_names
            else None
        )
        for col_name, test, spec in self.plan.tasks:
            col = batch[col_name]
            mask = checks.run_test(test, col, spec)
            n = pc.sum(mask).as_py() or 0
            if n == 0:
                continue
            bad_vals = _stringify(pc.filter(col.combine_chunks(), mask))
            refs.append(
                pc.filter(id_col, mask)
                if id_col is not None
                else pa.nulls(n, type=pa.string())
            )
            cols.append(pa.array([col_name] * n, type=pa.string()))
            tests.append(pa.array([test] * n, type=pa.string()))
            values.append(bad_vals)
        if not refs:
            return VIOLATION_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in refs]),
                pa.concat_arrays(cols),
                pa.concat_arrays(tests),
                pa.concat_arrays(values),
            ],
            schema=VIOLATION_SCHEMA,
        )
