"""Row-level expression checks — SQL CHECK-constraint semantics.

The reference validates one column at a time (reference
pandas_validator.py); real tables also carry CROSS-column invariants
("tax + discount < 0.15", "end_ts >= start_ts", "status='refund' ⇒
amount<0"). ``expression_violations`` evaluates an arbitrary pyarrow
dataset :class:`~pyarrow.dataset.Expression` per batch and returns the
rows that FAIL the constraint under SQL three-valued logic: a CHECK
passes when the predicate is TRUE, so violations are the rows where it
is FALSE **or NULL** — exactly ``WHERE NOT (expr) OR (expr) IS NULL``.

Arrow's kleene logic makes the complement precise without a Python
row in sight: ``t.filter(~expr | expr.is_null())`` keeps false rows
(``~false = true``) and null rows (``is_null = true``) and drops true
rows — one C++ predicate pass per batch, streaming, zero shuffle.
"""

from __future__ import annotations

from ray.data import Dataset


def expression_violations(
    ds: Dataset,
    expr,
    *,
    keep_cols: list[str] | None = None,
) -> Dataset:
    """Rows violating the CHECK ``expr`` (a ``pyarrow.dataset``
    Expression built from ``pads.field(...)``): predicate FALSE or
    NULL. ``keep_cols`` prunes the output columns (the scan itself is
    already pruned to them — pass the expression's inputs plus the id
    columns you want to report)."""

    complement = ~expr | expr.is_null()

    def find(t):
        return t.filter(complement)

    pruned = ds.select_columns(keep_cols) if keep_cols else ds
    return pruned.map_batches(find, batch_format="pyarrow")
