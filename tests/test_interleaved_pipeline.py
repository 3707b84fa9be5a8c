"""End-to-end validation of the north-rule interleaved documents table:
pattern + uniqueness + span checks + media referential integrity in ONE
validate_dataset call (the flagship pipeline)."""

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
