"""End-to-end validation of the north-rule interleaved documents table:
pattern + uniqueness + span checks + media referential integrity in ONE
validate_dataset call (the flagship pipeline)."""

import pandas as pd
import pytest

from data_linter_ray import synth
from data_linter_ray.pipelines import validate_dataset


@pytest.fixture(scope="module")
def result(ray_session):
    docs = synth.documents_dataset(20_000)
    catalog = synth.media_catalog_dataset()
    return validate_dataset(
        docs,
        synth.documents_schema(),
        id_column="doc_id",
        ref_tables={"media_catalog.media_ref": catalog},
    )


def test_overall_invalid(result):
    assert not result.valid
    assert result.row_count == 20_000


def test_doc_id_checks_fire(result):
    r = result.response.get_result()
    assert r["doc_id"]["pattern_test"]["valid"] is False
    assert r["doc_id"]["unique_test"]["valid"] is False
    assert r["doc_id"]["nullable_test"]["valid"] is True
    # ~1% malformed ids
    n = result.counts[("doc_id", "pattern_test")]
    assert 0.005 * 20_000 < n < 0.02 * 20_000


def test_span_checks_fire(result):
    r = result.response.get_result()
    spans = r["spans"]
    failing = {t for t, v in spans.items() if isinstance(v, dict) and not v["valid"]}
    assert "span_kind_enum" in failing or "span_offset_min" in failing
    assert spans["referential_test"]["valid"] is False  # dangling media refs
    assert spans["span_count"]["valid"] is True  # lengths always 1..8


def test_violations_dataset_is_complete(result):
    viol = result.violations.to_pandas()
    assert set(viol.columns) == {"row_ref", "column", "test", "value"}
    got = viol.groupby(["column", "test"]).size().to_dict()
    assert got == {k: v for k, v in result.counts.items()}


def test_interleaved_analysis_crafted(ray_session):
    """span_stats / extract_text / media_ref_counts / span_kind_mix on
    a crafted table covering the edges: null span list, empty list,
    doc with no text spans, null kind, null text on a text span,
    duplicate doc_ids, repeated media refs."""
    import numpy as np
    import pyarrow as pa

    import ray
    from data_linter_ray.functions.interleaved import (
        extract_text,
        media_ref_counts,
        span_kind_mix,
        span_stats,
    )

    def sp(kind, text=None, ref=None, off=0):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = [
        {"doc_id": "a", "spans": [sp("text", "hello", off=0),
                                  sp("image", ref="m1", off=5),
                                  sp("text", "world", off=9)]},
        {"doc_id": "a", "spans": [sp("image", ref="m1", off=0)]},  # dup id, no text
        {"doc_id": "b", "spans": []},                               # empty list
        {"doc_id": "c", "spans": None},                             # null list
        {"doc_id": "d", "spans": [sp(None, off=3),                  # null kind
                                  sp("text", None, off=7),          # null text
                                  sp("audio", ref="m2", off=11)]},
        # spans exist but EVERY offset is null → SQL max of all-NULL set
        {"doc_id": "e", "spans": [sp("text", "x", off=None),
                                  sp("image", ref="m3", off=None)]},
    ]
    ds = ray.data.from_items(rows)

    st = span_stats(ds).to_pandas()
    by = {  # (doc_id order preserved per row; dup 'a' rows distinguished by n_spans)
        (r.doc_id, r.n_spans): r for r in st.itertuples()
    }
    r = by[("a", 3)]
    assert (r.n_text, r.n_image, r.text_chars, r.max_offset) == (2, 1, 10, 9)
    assert by[("a", 1)].n_image == 1 and by[("a", 1)].n_text == 0
    assert by[("b", 0)].n_spans == 0 and pd.isna(by[("b", 0)].max_offset)
    assert by[("c", 0)].n_spans == 0 and pd.isna(by[("c", 0)].max_offset)
    d = by[("d", 3)]
    # null kind and null-text text-span contribute no kind counts/chars
    assert (d.n_text, d.n_audio, d.text_chars, d.max_offset) == (1, 1, 0, 11)
    e = by[("e", 2)]
    # a row with spans but only null offsets: max_offset is NULL, not a
    # sentinel (SQL MAX over an all-NULL set)
    assert e.n_text == 1 and pd.isna(e.max_offset)

    tx = extract_text(ds).to_pandas()
    # only rows with ≥1 non-null text survive; span-order join
    assert sorted(tx["text"]) == ["hello world", "x"]
    assert sorted(tx["doc_id"].tolist()) == ["a", "e"]

    mc = media_ref_counts(ds, min_refs=1).to_pandas()
    assert dict(zip(mc["media_ref"], mc["n_refs"])) == {
        "m1": 2, "m2": 1, "m3": 1,
    }
    mc2 = media_ref_counts(ds, min_refs=2).to_pandas()
    assert dict(zip(mc2["media_ref"], mc2["n_refs"])) == {"m1": 2}

    mix = span_kind_mix(ds)
    got = {r.kind: (r.n_spans, r.n_docs) for r in mix.itertuples()}
    assert got == {"text": (4, 3), "image": (3, 3), "audio": (1, 1)}


def test_interleaved_analysis_vs_duckdb(ray_session, sf_dir):
    """The four interleaved analysis queries match their DuckDB oracles
    over the span fixture (same check the driver gate runs)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    con = duckdb.connect()
    for name in ("span_stats", "doc_texts", "media_ref_counts", "span_kind_mix"):
        got = qs[name](sf_dir)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        exp = con.execute(oracles[name]).df()
        got = got.reindex(sorted(got.columns), axis=1).sort_values(
            list(sorted(got.columns))).reset_index(drop=True)
        exp = exp.reindex(sorted(exp.columns), axis=1).sort_values(
            list(sorted(exp.columns))).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
