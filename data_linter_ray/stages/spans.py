"""Span checks over ``list<struct>`` columns (north-rule payload).

The reference engine is flat-relational; these checks are the engine's
extension to interleaved text+media documents
(``BASELINE.json:input_hint``). All kernels flatten the list column once
per batch with ``pc.list_flatten`` / ``pc.list_parent_indices`` and work
on the flat child arrays with vectorized Arrow/numpy ops — never a Python
loop over rows (SURVEY.md §2.8).

Checks (FIXTURES.md F1 constraint set):
  - ``span_kind_enum``        kind ∈ {text, image, audio, video}
  - ``span_text_presence``    text non-null iff kind == "text"
  - ``span_media_presence``   media_ref non-null iff kind != "text"
  - ``span_media_pattern``    media_ref matches ^media://[a-z0-9/]+$
  - ``span_offset_min``       offset >= 0
  - ``span_offset_order``     offsets non-decreasing within a row
  - ``span_count``            list length within [1, 64]
  - ``span_media_ref_integrity``  flattened media_ref ⊆ media catalog

Plus row-wise **span-sequence equality** between two span columns
(kind, text, media_ref, order) — the per-row invariant the north rule
requires vs the reference copy of each document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from data_linter_ray.stages.checker import VIOLATION_SCHEMA, _stringify

KIND_ENUM = ["text", "image", "audio", "video"]
MEDIA_REF_PATTERN = "^media://[a-z0-9/]+$"
MAX_SPANS = 64

SPAN_TESTS = [
    "span_kind_enum",
    "span_text_presence",
    "span_media_presence",
    "span_media_pattern",
    "span_offset_min",
    "span_offset_order",
    "span_count",
]


def _flatten(spans: pa.ChunkedArray | pa.Array):
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    return spans, flat, parents


class SpanContext:
    """Per-batch memo shared by the span-family checkers inside the
    fused check pass: ONE combine+flatten per span column and ONE
    dictionary-encode of the flattened media_ref. The media refs
    repeat heavily (a bounded asset catalog), so both the media
    pattern regex and the catalog anti-join run their kernel on the
    ~distinct dictionary and ``take`` the result back — measured ~25%
    of the fused checker's per-batch CPU on the interleaved corpus."""

    def __init__(self, table: pa.Table):
        self._table = table
        self._flat: dict = {}
        self._media_dict: dict = {}

    def flat(self, col: str):
        if col not in self._flat:
            self._flat[col] = _flatten(self._table[col])
        return self._flat[col]

    def media_dict(self, col: str):
        if col not in self._media_dict:
            _spans, flat, _parents = self.flat(col)
            self._media_dict[col] = flat.field("media_ref").dictionary_encode()
        return self._media_dict[col]


def _on_dict(kernel, dict_array) -> pa.Array:
    """Run a boolean kernel over a DictionaryArray's distinct values and
    expand back through the indices (null index → null, caller fills)."""
    small = kernel(dict_array.dictionary)
    return pc.take(small, dict_array.indices)


def span_check_masks(spans, ctx_pair=None) -> dict[str, np.ndarray]:
    """All span checks in one flatten pass → {test: row-level bool mask}.

    ``ctx_pair`` is an optional ``(flattened_triple, media_dict)`` from
    :class:`SpanContext`; without it both are computed locally."""
    if ctx_pair is not None:
        (spans, flat, parents), media_dict = ctx_pair
    else:
        spans, flat, parents = _flatten(spans)
        media_dict = flat.field("media_ref").dictionary_encode()
    n_rows = len(spans)
    kind = flat.field("kind")
    text = flat.field("text")
    media = flat.field("media_ref")
    offset = flat.field("offset")

    def rowify(flat_mask) -> np.ndarray:
        """element-level violation mask → row-level mask via parent index
        (bincount of violating parents — ~10× faster than logical_or.at)."""
        fm = (
            pc.fill_null(flat_mask, False).to_numpy(zero_copy_only=False)
            if not isinstance(flat_mask, np.ndarray)
            else flat_mask
        )
        hits = parents[: len(fm)][fm]
        return np.bincount(hits, minlength=n_rows).astype(bool)

    out: dict[str, np.ndarray] = {}
    is_text = pc.equal(kind, "text")
    out["span_kind_enum"] = rowify(
        pc.invert(pc.fill_null(pc.is_in(kind, value_set=pa.array(KIND_ENUM)), False))
    )
    out["span_text_presence"] = rowify(
        pc.and_kleene(pc.fill_null(is_text, False), pc.is_null(text))
    )
    out["span_media_presence"] = rowify(
        pc.and_kleene(
            pc.invert(pc.fill_null(is_text, True)), pc.is_null(media)
        )
    )
    out["span_media_pattern"] = rowify(
        pc.and_kleene(
            pc.invert(pc.is_null(media)),
            pc.invert(
                pc.fill_null(
                    _on_dict(
                        lambda d: pc.match_substring_regex(d, MEDIA_REF_PATTERN),
                        media_dict,
                    ),
                    False,
                )
            ),
        )
    )
    out["span_offset_min"] = rowify(pc.less(offset, 0))

    # offsets non-decreasing within each row: element i violates when it
    # shares a parent with element i-1 and offset[i] < offset[i-1]
    off = offset.to_numpy(zero_copy_only=False)
    if len(off):
        same_parent = np.empty(len(off), dtype=bool)
        same_parent[0] = False
        same_parent[1:] = parents[1:] == parents[:-1]
        decreasing = np.empty(len(off), dtype=bool)
        decreasing[0] = False
        with np.errstate(invalid="ignore"):
            decreasing[1:] = off[1:] < off[:-1]
        out["span_offset_order"] = rowify(same_parent & decreasing)
    else:
        out["span_offset_order"] = np.zeros(n_rows, dtype=bool)

    counts = pc.fill_null(pc.list_value_length(spans), 0)
    out["span_count"] = pc.or_(
        pc.less(counts, 1), pc.greater(counts, MAX_SPANS)
    ).to_numpy(zero_copy_only=False)
    return out


class SpanChecker:
    """map_batches callable: span checks → long-format violation rows."""

    accepts_span_ctx = True

    def __init__(self, spans_col: str = "spans", id_column: str | None = "doc_id"):
        self.spans_col = spans_col
        self.id_column = id_column

    def __call__(self, batch: pa.Table, ctx: "SpanContext | None" = None) -> pa.Table:
        pair = (
            (ctx.flat(self.spans_col), ctx.media_dict(self.spans_col))
            if ctx is not None
            else None
        )
        masks = span_check_masks(batch[self.spans_col], ctx_pair=pair)
        id_col = (
            _stringify(batch[self.id_column].combine_chunks())
            if self.id_column and self.id_column in batch.column_names
            else None
        )
        refs, cols, tests, values = [], [], [], []
        for test, mask in masks.items():
            n = int(mask.sum())
            if not n:
                continue
            pa_mask = pa.array(mask)
            refs.append(
                pc.filter(id_col, pa_mask) if id_col is not None else pa.nulls(n, pa.string())
            )
            cols.append(pa.array([self.spans_col] * n, type=pa.string()))
            tests.append(pa.array([test] * n, type=pa.string()))
            values.append(pa.nulls(n, pa.string()))
        if not refs:
            return VIOLATION_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([r.combine_chunks() if isinstance(r, pa.ChunkedArray) else r for r in refs]),
                pa.concat_arrays(cols),
                pa.concat_arrays(tests),
                pa.concat_arrays(values),
            ],
            schema=VIOLATION_SCHEMA,
        )


def span_violations(ds: Dataset, spans_col: str = "spans", id_column: str | None = "doc_id") -> Dataset:
    cols = [spans_col] + ([id_column] if id_column else [])
    return ds.select_columns(cols).map_batches(
        SpanChecker(spans_col, id_column), batch_format="pyarrow"
    )


class SpanMediaRefChecker:
    """Per-batch: flatten spans.media_ref and anti-join against the
    broadcast catalog key set → violation rows attributed to the spans
    column. (Batch-level so it can be fused into the single check pass.)"""

    accepts_span_ctx = True

    def __init__(self, spans_col: str, id_column: str | None, pk_set_ref):
        self.spans_col = spans_col
        self.id_column = id_column
        self.pk_set_ref = pk_set_ref
        self._pk_set = None

    def __call__(self, t: pa.Table, ctx: "SpanContext | None" = None) -> pa.Table:
        import ray

        if self._pk_set is None:
            obj = self.pk_set_ref
            self._pk_set = ray.get(obj) if isinstance(obj, ray.ObjectRef) else obj
        if ctx is not None:
            spans, flat, parents = ctx.flat(self.spans_col)
            media_dict = ctx.media_dict(self.spans_col)
        else:
            spans, flat, parents = _flatten(t[self.spans_col])
            media_dict = flat.field("media_ref").dictionary_encode()
        media = flat.field("media_ref")
        present = pc.invert(pc.is_null(media))
        dangling = pc.and_(
            present,
            pc.invert(
                pc.fill_null(
                    _on_dict(
                        lambda d: pc.is_in(d, value_set=self._pk_set), media_dict
                    ),
                    False,
                )
            ),
        )
        n = pc.sum(dangling).as_py() or 0
        if not n:
            return VIOLATION_SCHEMA.empty_table()
        if self.id_column and self.id_column in t.column_names:
            ids = t[self.id_column].combine_chunks().take(pa.array(parents))
            refs = _stringify(pc.filter(ids, dangling))
        else:
            refs = pa.nulls(n, pa.string())
        from data_linter_ray.checks import REFERENTIAL_TEST

        return pa.Table.from_arrays(
            [
                refs,
                pa.array([self.spans_col] * n, type=pa.string()),
                pa.array([REFERENTIAL_TEST] * n, type=pa.string()),
                _stringify(pc.filter(media, dangling)),
            ],
            schema=VIOLATION_SCHEMA,
        )


def media_ref_violations(ds: Dataset, catalog: Dataset, spans_col: str = "spans", id_column: str | None = "doc_id") -> Dataset:
    """Flattened spans.media_ref ⊆ media_catalog.media_ref (broadcast)."""
    import ray

    from data_linter_ray.stages.referential import distinct_key_set

    pk_ref = ray.put(distinct_key_set(catalog, "media_ref"))
    cols = [spans_col] + ([id_column] if id_column else [])
    return ds.select_columns(cols).map_batches(
        SpanMediaRefChecker(spans_col, id_column, pk_ref), batch_format="pyarrow"
    )


def span_sequence_equality_mask(left, right, compare_offsets: bool = False) -> np.ndarray:
    """Row-level inequality mask between two span columns.

    Exact span-sequence equality = same length AND element-wise equal
    (kind, text, media_ref) in order; ``compare_offsets`` adds offset.
    Fully vectorized: one flatten per side, numpy equality on children.
    """
    left = left.combine_chunks() if isinstance(left, pa.ChunkedArray) else left
    right = right.combine_chunks() if isinstance(right, pa.ChunkedArray) else right
    n = len(left)
    len_l = pc.fill_null(pc.list_value_length(left), -1).to_numpy(zero_copy_only=False)
    len_r = pc.fill_null(pc.list_value_length(right), -1).to_numpy(zero_copy_only=False)
    unequal = len_l != len_r
    both = ~unequal
    if not both.any():
        return unequal
    keep = pa.array(both)
    sub_l = pc.filter(left, keep)
    sub_r = pc.filter(right, keep)
    flat_l = pc.list_flatten(sub_l)
    flat_r = pc.list_flatten(sub_r)
    parents = pc.list_parent_indices(sub_l).to_numpy(zero_copy_only=False)
    fields = ["kind", "text", "media_ref"] + (["offset"] if compare_offsets else [])
    elem_neq = np.zeros(len(flat_l), dtype=bool)
    for f in fields:
        a, b = flat_l.field(f), flat_r.field(f)
        # null-safe inequality: values differ, or exactly one side null
        neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(zero_copy_only=False)
        null_mismatch = pc.xor(pc.is_null(a), pc.is_null(b)).to_numpy(zero_copy_only=False)
        elem_neq |= neq | null_mismatch
    row_neq_sub = np.bincount(parents[elem_neq], minlength=int(both.sum())).astype(bool)
    unequal[np.flatnonzero(both)] = row_neq_sub
    return unequal


class SpanEqualityChecker:
    """Per-batch row-wise span-sequence equality → violation rows."""

    def __init__(
        self,
        left_col: str = "spans",
        right_col: str = "spans_reference",
        id_column: str | None = "doc_id",
        compare_offsets: bool = False,
    ):
        self.left_col = left_col
        self.right_col = right_col
        self.id_column = id_column
        self.compare_offsets = compare_offsets

    def __call__(self, t: pa.Table) -> pa.Table:
        mask = span_sequence_equality_mask(
            t[self.left_col], t[self.right_col], compare_offsets=self.compare_offsets
        )
        n = int(mask.sum())
        if not n:
            return VIOLATION_SCHEMA.empty_table()
        pa_mask = pa.array(mask)
        refs = (
            pc.filter(_stringify(t[self.id_column].combine_chunks()), pa_mask)
            if self.id_column and self.id_column in t.column_names
            else pa.nulls(n, pa.string())
        )
        return pa.Table.from_arrays(
            [
                refs,
                pa.array([self.left_col] * n, type=pa.string()),
                pa.array(["span_sequence_equality"] * n, type=pa.string()),
                pa.nulls(n, pa.string()),
            ],
            schema=VIOLATION_SCHEMA,
        )


def span_equality_violations(
    ds: Dataset,
    left_col: str = "spans",
    right_col: str = "spans_reference",
    id_column: str | None = "doc_id",
    compare_offsets: bool = False,
) -> Dataset:
    """Rows whose span sequence differs from the reference copy."""
    cols = [left_col, right_col] + ([id_column] if id_column else [])
    return ds.select_columns(cols).map_batches(
        SpanEqualityChecker(left_col, right_col, id_column, compare_offsets),
        batch_format="pyarrow",
    )
