"""Exercise the large-dimension SHUFFLE referential path (broadcast is
the default; the shuffle anti-join only engages past the row threshold)
and property-based checks with hypothesis."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray
from data_linter_ray.stages.referential import (
    referential_violations_broadcast,
    referential_violations_shuffle,
)


def test_shuffle_referential_matches_broadcast(ray_session):
    rng = np.random.RandomState(0)
    fk = rng.randint(0, 2000, 5000)
    pk = np.arange(0, 1500)  # fk values >= 1500 dangle
    orders = ray.data.from_arrow(pa.table({"k": fk}))
    dim = ray.data.from_arrow(pa.table({"id": pk}))

    shuffled = referential_violations_shuffle(orders, "k", dim, "id").to_pandas()
    broadcast = referential_violations_broadcast(orders, "k", dim, "id").to_pandas()
    # shuffle path reports key-level; broadcast row-level — compare key sets
    assert set(shuffled["value"]) == set(broadcast["value"])
    expected = {str(v) for v in np.unique(fk[fk >= 1500])}
    assert set(shuffled["value"]) == expected


def test_validate_dataset_uses_shuffle_for_big_dims(ray_session, monkeypatch):
    import data_linter_ray.pipelines.validate as V
    from data_linter_ray.metadata import ColumnSpec, TableSchema
    from data_linter_ray.pipelines import validate_dataset

    monkeypatch.setattr(V, "BROADCAST_ROW_THRESHOLD", 10, raising=False)
    # patch the imported constant in the validate module's function scope:
    # validate re-imports from referential, so patch there too
    import data_linter_ray.stages.referential as R

    monkeypatch.setattr(R, "BROADCAST_ROW_THRESHOLD", 10)

    schema = TableSchema(
        name="o", columns=[ColumnSpec(name="k", type="int64", references="dim.id")]
    )
    orders = ray.data.from_arrow(pa.table({"k": [1, 2, 99, 100]}))
    dim = ray.data.from_arrow(pa.table({"id": list(range(50))}))  # > threshold
    res = validate_dataset(orders, schema, ref_tables={"dim.id": dim})
    assert res.counts.get(("k", "referential_test")) == 2  # 99, 100
    assert not res.valid


# ---------------- hypothesis property tests ------------------------------


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.integers(-1000, 1000)), max_size=50),
    st.integers(-100, 100),
    st.integers(-100, 100),
)
def test_min_max_mask_matches_pandas(values, lo, hi):
    import pandas as pd

    from data_linter_ray import checks

    if lo > hi:
        lo, hi = hi, lo
    col = pa.array(values, type=pa.int64())
    got = checks.min_max_mask(col, lo, hi).to_pylist()
    s = pd.Series(values, dtype="Int64")
    exp = ((s < lo) | (s > hi)).fillna(False).tolist()
    assert got == exp


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=8)), max_size=40))
def test_enum_mask_matches_pandas(values):
    import pandas as pd

    from data_linter_ray import checks

    enum = ["a", "b", "xyz"]
    col = pa.array(values, type=pa.string())
    s = pd.Series(values, dtype="string")
    got_nullable = checks.enum_mask(col, enum, True).to_pylist()
    exp_nullable = (~s.fillna(enum[0]).isin(enum)).tolist()
    assert got_nullable == exp_nullable
    got_strict = checks.enum_mask(col, enum, False).to_pylist()
    exp_strict = (~s.isin(enum)).fillna(True).astype(bool).tolist()
    assert got_strict == exp_strict


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6), min_size=10, max_size=500), st.integers(2, 6))
def test_tdigest_merge_associative(values, n_parts):
    from data_linter_ray.state.sketches import TDigest

    arr = np.array(values)
    parts = np.array_split(arr, n_parts)
    acc = TDigest()
    for p in parts:
        t = TDigest()
        t.add(p)
        acc.merge(t)
    lo, hi = arr.min(), arr.max()
    for q in (0.1, 0.5, 0.9):
        v = acc.quantile(q)
        assert lo - 1e-9 <= v <= hi + 1e-9
    assert acc.count == pytest.approx(len(arr))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=300))
def test_hll_never_wildly_wrong(keys):
    from data_linter_ray.state.sketches import HyperLogLog, hash_array

    true = len(set(keys))
    h = HyperLogLog()
    h.add_hashes(hash_array(np.array(keys, dtype=object)))
    est = h.estimate()
    assert 0.5 * true <= est <= 1.5 * true + 2


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=__import__("datetime").datetime(1, 1, 1),
            max_value=__import__("datetime").datetime(9999, 12, 28),
        ),
        max_size=20,
    ),
    st.sampled_from(["%Y-%m-%d", "%d/%m/%Y", "%Y-%m-%d %H:%M:%S", "%m-%Y"]),
    st.sampled_from(["%Y-%m-%d", "%d/%m/%Y", "%Y-%m-%d %H:%M:%S"]),
)
def test_date_format_mask_matches_strptime(dts, render_fmt, check_fmt):
    """date_format_mask == per-value strptime loop (the reference
    implementation) for arbitrary dates rendered in arbitrary formats."""
    from datetime import datetime

    from data_linter_ray import checks

    values = [d.strftime(render_fmt) for d in dts]
    col = pa.array(values, type=pa.string())

    def ref_ok(x):
        if x == "":
            return True
        try:
            dt = datetime.strptime(x, check_fmt)
            return dt.hour == 0 and dt.minute == 0 and dt.second == 0 and dt.microsecond == 0
        except ValueError:
            return False

    exp = [not ref_ok(v) for v in values]
    got = checks.date_format_mask(col, check_fmt).to_pylist()
    assert got == exp


def test_uniqueness_exchange_survives_extreme_skew(ray_session):
    """One key owning 50% of all rows (the north-rule hot doc_id range):
    per-block pre-aggregation collapses the hot key to one partial per
    block BEFORE the exchange, so no partition ever receives the raw hot
    rows. Counts must still be exact."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from data_linter_ray.stages.uniqueness import duplicate_keys

    n = 200_000
    def gen(batch):
        ids = np.asarray(batch["id"])
        # half the rows share key 0; the rest are unique
        keys = np.where(ids % 2 == 0, 0, ids)
        return pa.table({"k": keys})

    ds = ray.data.range(n, override_num_blocks=16).map_batches(gen, batch_format="numpy")
    dup = duplicate_keys(ds, "k").to_pandas()
    assert len(dup) == 1
    assert dup.iloc[0]["k"] == 0 and dup.iloc[0]["n"] == n // 2
