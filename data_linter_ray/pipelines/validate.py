"""validate_dataset — the library-call pipeline.

Equivalent of using the reference's ``PandasValidator`` directly
(``/root/reference/data_linter/validators/pandas_validator.py:30-96``,
README.md:114-134), re-expressed Ray-Data-first:

    ds (Arrow blocks) ──► map_batches(BatchChecker)  ──► violation rows ─┐
        │                                                                ├─► counts
        ├─► uniqueness shuffle check (per `unique` columns) ─────────────┤    (small
        └─► referential broadcast/shuffle check (per `references`) ──────┘   groupby)
                                                           │
                                       ValidatorResult nested verdict dict

Only *aggregated counts* and (optionally) bounded violation samples ever
reach the driver; the violation row Dataset itself stays distributed and is
returned for the caller to sink with ``write_parquet``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count

from data_linter_ray import checks
from data_linter_ray.metadata import TableSchema
from data_linter_ray.result import ValidatorResult
from data_linter_ray.stages.checker import (
    VIOLATION_SCHEMA,
    BatchChecker,
    ColumnAlignmentError,
    compile_plan,
)
from data_linter_ray.stages.referential import referential_violations
from data_linter_ray.stages.uniqueness import uniqueness_violations


@dataclass
class TableValidationResult:
    response: ValidatorResult
    violations: Optional[Dataset]
    row_count: int = 0
    counts: dict = field(default_factory=dict)  # (column, test) -> n_violations

    @property
    def valid(self) -> bool:
        return self.response.valid


def _violation_counts(violations: Dataset) -> dict[tuple[str, str], int]:
    """Small groupby over the (already bounded) violation rows."""
    agg = violations.groupby(["column", "test"]).aggregate(Count(alias_name="n"))
    out: dict[tuple[str, str], int] = {}
    for row in agg.take_all():  # rows = #columns × #tests — tiny
        out[(row["column"], row["test"])] = row["n"]
    return out


def validate_dataset(
    ds: Dataset,
    schema: TableSchema,
    *,
    id_column: Optional[str] = None,
    ref_tables: Optional[dict[str, Dataset]] = None,
    allow_missing_cols: bool = False,
    allow_unexpected_data: bool = False,
    row_limit: Optional[int] = None,
    log_verbosity: Optional[int] = None,
) -> TableValidationResult:
    """Validate a Dataset against a TableSchema.

    ``ref_tables`` maps the ``references`` target strings
    (``"table.column"``) to their Datasets for referential checks.
    ``log_verbosity`` mirrors the reference (pandas_validator.py:352-382):
    None → no value samples in the response dict; 0 → all; n → up to n.
    """
    response = ValidatorResult()
    try:
        data_schema = ds.schema().base_schema
        plan = compile_plan(
            schema,
            data_schema,
            id_column=id_column,
            allow_missing_cols=allow_missing_cols,
            allow_unexpected_data=allow_unexpected_data,
        )
    except ColumnAlignmentError as e:
        # reference parity: alignment failure is a table-level failed test,
        # not an exception out of the run (pandas_validator.py:65-82)
        response.add_table_test(
            "overall_validation", {"valid": False, "traceback": str(e)}
        )
        return TableValidationResult(response=response, violations=None)

    if row_limit is not None:
        ds = ds.limit(row_limit)

    # --- column-pruned stateless check pass -----------------------------
    needed = plan.input_columns
    violation_parts: list[Dataset] = []
    if plan.tasks:
        checked = ds.select_columns(needed) if needed else ds
        violation_parts.append(
            checked.map_batches(BatchChecker(plan), batch_format="pyarrow")
        )

    # --- span checks (list<struct> interleaved payload) -----------------
    span_cols = [
        c
        for c in schema.columns
        if c.name in data_schema.names
        and (c.span_constraints is not None or c.type in ("spans", "list<span>"))
    ]
    for spec in span_cols:
        from data_linter_ray.stages.spans import (
            media_ref_violations,
            span_equality_violations,
            span_violations,
        )

        sc = spec.span_constraints or {}
        violation_parts.append(
            span_violations(ds, spans_col=spec.name, id_column=id_column)
        )
        if spec.references and ref_tables and spec.references in ref_tables:
            pk = spec.references.split(".", 1)[1]
            violation_parts.append(
                media_ref_violations(
                    ds, ref_tables[spec.references], spans_col=spec.name, id_column=id_column
                )
            )
        ref_col = sc.get("reference_column")
        if ref_col and ref_col in data_schema.names:
            violation_parts.append(
                span_equality_violations(
                    ds,
                    left_col=spec.name,
                    right_col=ref_col,
                    id_column=id_column,
                    compare_offsets=bool(sc.get("compare_offsets", False)),
                )
            )

    # --- extension shuffle checks --------------------------------------
    unique_cols = [c.name for c in schema.columns if c.unique and c.name in data_schema.names]
    for col in unique_cols:
        violation_parts.append(uniqueness_violations(ds, col))
    span_col_names = {c.name for c in span_cols}
    ref_specs = [
        c
        for c in schema.columns
        if c.references
        and c.name in data_schema.names
        and c.name not in span_col_names  # span refs are media_ref_violations
    ]
    for spec in ref_specs:
        target = (ref_tables or {}).get(spec.references)
        if target is None:
            response.add_table_test(
                f"missing_ref_table_{spec.references}",
                {"valid": False, "traceback": f"no ref table for {spec.references}"},
            )
            continue
        pk = spec.references.split(".", 1)[1]
        violation_parts.append(
            referential_violations(ds, spec.name, target, pk, id_column=id_column)
        )

    row_count = ds.count()

    if violation_parts:
        violations = violation_parts[0]
        for part in violation_parts[1:]:
            violations = violations.union(part)
        # bounded by total violation volume (not input volume); pins the
        # result so the counts pass and the caller's sink don't re-scan
        violations = violations.materialize()
        counts = _violation_counts(violations)
    else:
        import ray

        violations = ray.data.from_arrow(VIOLATION_SCHEMA.empty_table())
        counts = {}

    samples: dict[tuple[str, str], tuple[list, list]] = {}
    if log_verbosity is not None and counts:
        samples = _collect_samples(violations, log_verbosity)

    _build_response(
        response, plan, schema, counts, row_count, samples, log_verbosity,
        unique_cols, ref_specs, span_cols,
    )
    return TableValidationResult(
        response=response,
        violations=violations,
        row_count=row_count,
        counts=counts,
    )


def _collect_samples(
    violations: Dataset, n: int
) -> dict[tuple[str, str], tuple[list, list]]:
    """Per-(column,test) bounded samples of (row_ref, value).

    n == 0 means "all" (reference semantics) — use with care at scale.
    """
    import pandas as pd

    def head(g: "pd.DataFrame") -> "pd.DataFrame":
        return g if n == 0 else g.head(n)

    sampled = violations.groupby(["column", "test"]).map_groups(
        head, batch_format="pandas"
    )
    out: dict[tuple[str, str], tuple[list, list]] = {}
    for row in sampled.take_all():
        key = (row["column"], row["test"])
        refs, vals = out.setdefault(key, ([], []))
        refs.append(row["row_ref"])
        vals.append(row["value"])
    return out


def _build_response(
    response: ValidatorResult,
    plan,
    schema: TableSchema,
    counts: dict,
    row_count: int,
    samples: dict,
    log_verbosity,
    unique_cols,
    ref_specs,
    span_cols=(),
) -> None:
    """Assemble the reference-shaped nested verdict dict
    (base.py:9-103 / pandas_validator.py:352-382 parity)."""

    def fill(colname: str, test: str, inputs: dict) -> None:
        n_bad = counts.get((colname, test), 0)
        res: dict = {"valid": n_bad == 0, "test_inputs": inputs}
        if n_bad:
            res["percentage_of_column_is_error"] = (
                n_bad / row_count * 100 if row_count else 0.0
            )
            if log_verbosity is not None and (colname, test) in samples:
                refs, vals = samples[(colname, test)]
                res["unexpected_index_sample"] = refs
                res["unexpected_values_sample"] = vals
        response.add_test_to_col(colname, test, res)

    for col_name, test, spec in plan.tasks:
        fill(col_name, test, checks.test_inputs(test, spec))
    for col in unique_cols:
        fill(col, checks.UNIQUE_TEST, {"column": col})
    for spec in ref_specs:
        fill(
            spec.name,
            checks.REFERENTIAL_TEST,
            {"column": spec.name, "references": spec.references},
        )
    for spec in span_cols:
        from data_linter_ray.stages.spans import SPAN_TESTS

        for test in SPAN_TESTS:
            fill(spec.name, test, {"column": spec.name})
        if spec.references:
            fill(
                spec.name,
                checks.REFERENTIAL_TEST,
                {"column": spec.name, "references": spec.references},
            )
        sc = spec.span_constraints or {}
        if sc.get("reference_column"):
            fill(
                spec.name,
                "span_sequence_equality",
                {"column": spec.name, "reference_column": sc["reference_column"]},
            )
