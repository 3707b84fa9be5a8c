"""Sketch correctness: accuracy bounds + merge associativity (the property
that makes the Ray partial→merge pipeline retry-safe), plus the drift
stage end-to-end on real testdata."""

import numpy as np
import pytest

from data_linter_ray.state.sketches import KLL, HyperLogLog, TDigest, hash_array


def test_tdigest_quantile_accuracy():
    rng = np.random.RandomState(42)
    x = rng.normal(100, 15, 200_000)
    td = TDigest()
    for chunk in np.array_split(x, 37):
        td.add(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(x, q)
        assert td.quantile(q) == pytest.approx(exact, abs=0.5), q
    assert td.count == pytest.approx(len(x))


def test_tdigest_merge_equals_bulk():
    rng = np.random.RandomState(7)
    x = rng.exponential(10, 100_000)
    parts = np.array_split(x, 13)
    digests = []
    for p in parts:
        td = TDigest()
        td.add(p)
        digests.append(TDigest.from_bytes(td.to_bytes()))  # round-trip too
    acc = digests[0]
    for d in digests[1:]:
        acc.merge(d)
    bulk = TDigest()
    bulk.add(x)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert acc.quantile(q) == pytest.approx(bulk.quantile(q), rel=0.05), q
        assert acc.quantile(q) == pytest.approx(np.quantile(x, q), rel=0.05), q


def test_tdigest_merge_order_invariance():
    rng = np.random.RandomState(3)
    parts = [rng.uniform(0, 1, 5000) for _ in range(6)]

    def fold(order):
        acc = TDigest()
        for i in order:
            td = TDigest()
            td.add(parts[i])
            acc.merge(td)
        return acc.quantile(0.5)

    a = fold([0, 1, 2, 3, 4, 5])
    b = fold([5, 3, 1, 0, 2, 4])
    assert a == pytest.approx(b, rel=0.02)


def test_tdigest_bounded_size():
    td = TDigest(delta=100)
    td.add(np.arange(1_000_000, dtype=np.float64))
    td._compress()
    assert td.means.size < 1000  # centroids bounded (≈6δ) regardless of n


def test_hll_accuracy_and_merge():
    true_n = 50_000
    vals = np.array([f"key-{i}" for i in range(true_n)], dtype=object)
    h = hash_array(vals)
    parts = np.array_split(h, 9)
    hlls = []
    for p in parts:
        s = HyperLogLog()
        s.add_hashes(p)
        hlls.append(HyperLogLog.from_bytes(s.to_bytes()))
    acc = hlls[0]
    for s in hlls[1:]:
        acc.merge(s)
    assert acc.estimate() == pytest.approx(true_n, rel=0.05)
    # duplicates must not change the estimate (idempotent merge)
    again = HyperLogLog()
    again.add_hashes(h)
    acc.merge(again)
    assert acc.estimate() == pytest.approx(true_n, rel=0.05)


def test_hll_small_range():
    s = HyperLogLog()
    s.add_hashes(hash_array(np.array([f"v{i}" for i in range(100)], dtype=object)))
    assert s.estimate() == pytest.approx(100, rel=0.15)


def test_hash_array_stability():
    a = hash_array(np.array(["x", "y"], dtype=object))
    b = hash_array(np.array(["x", "y"], dtype=object))
    assert (a == b).all()


def test_drift_stage_end_to_end(ray_session, sf_dir):
    import ray
    from data_linter_ray.stages.sketch_stage import (
        cardinality_drift,
        compute_sketches,
        drift_check,
        quantile_drift,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    base = compute_sketches(ds, ["value"], ["user_id", "event_type"])
    assert "tdigest" in base["value"] and "hll" in base["user_id"]
    # cardinality estimates close to truth
    import duckdb

    truth = duckdb.sql(
        f"SELECT count(DISTINCT user_id), count(DISTINCT event_type) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    assert base["user_id"]["hll"].estimate() == pytest.approx(truth[0], rel=0.1)
    assert base["event_type"]["hll"].estimate() == pytest.approx(truth[1], rel=0.1)

    # same data vs itself → no drift
    results = drift_check(ds, base, threshold=0.05)
    assert all(r.valid for r in results), [(r.column, r.distance) for r in results]

    # shifted data → quantile drift fires
    import pyarrow.compute as pc

    shifted = ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("value"),
            "value",
            pc.add(t["value"], 50.0),
        ),
        batch_format="pyarrow",
    )
    results = drift_check(shifted, {"value": base["value"]}, threshold=0.05)
    assert any(not r.valid for r in results)


def test_kll_rank_accuracy():
    """KLL normalized rank error stays well within the k=200 bound on a
    skewed distribution streamed in chunks."""
    rng = np.random.RandomState(7)
    data = rng.lognormal(0, 1, 100_000)
    sk = KLL(k=200, seed=1)
    for chunk in np.array_split(data, 23):
        sk.add(chunk)
    assert sk.count() == len(data)
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        true = np.quantile(data, q)
        assert abs(sk.rank(true) - q) < 0.02, q
    # retained size is tiny relative to the stream
    assert sk._size() < 2_000


def test_kll_merge_and_roundtrip():
    rng = np.random.RandomState(11)
    data = rng.normal(0, 1, 60_000)
    a, b = KLL(200, seed=2), KLL(200, seed=3)
    a.add(data[:30_000])
    b.add(data[30_000:])
    a.merge(b)
    assert a.count() == 60_000
    assert abs(a.rank(float(np.median(data))) - 0.5) < 0.02
    rt = KLL.from_bytes(a.to_bytes())
    assert rt.count() == a.count()
    assert rt.quantile(0.5) == a.quantile(0.5)


def test_compute_sketches_kll_and_drift(ray_session, sf_dir):
    import ray.data

    from data_linter_ray.stages.sketch_stage import (
        compute_sketches,
        drift_check,
        save_baselines,
        load_baselines,
    )

    # dense-tailed column (uniform-ish over [0, 100)): drift at the 1%/99%
    # quantiles of a randomized sketch is only stable when the tails are
    # dense — events.value at sf0.001 is 1k heavy-tailed rows, where two
    # sketches of the SAME data can disagree at Q(0.99) by > threshold
    def gen(batch):
        ids = np.asarray(batch["id"], dtype=np.int64)
        return {"value": ((ids * 2654435761) % 100_000) / 1000.0, "user_id": ids % 997}

    ds = ray.data.range(100_000, override_num_blocks=8).map_batches(
        gen, batch_format="numpy"
    )
    sk = compute_sketches(ds, ["value"], ["user_id"], quantile_sketch="kll")
    assert "kll" in sk["value"] and "hll" in sk["user_id"]
    # KLL's guarantee is on RANK error: the true median must sit at
    # normalized rank 0.5 ± eps in the merged sketch
    assert abs(sk["value"]["kll"].rank(50.0) - 0.5) < 0.02

    # KLL baselines round-trip and drive drift_check (self-drift small,
    # shifted data trips the threshold)
    path = save_baselines(sk, "/tmp/dlr_test_kll_baseline.json")
    base = load_baselines(path)
    assert "kll" in base["value"]
    self_drift = drift_check(ds, {"value": base["value"]}, threshold=0.1)
    assert self_drift and all(r.valid for r in self_drift)

    import pyarrow.compute as pc

    shifted = ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("value"),
            "value",
            pc.add(t["value"], 1000.0),
        ),
        batch_format="pyarrow",
    )
    drifted = drift_check(shifted, {"value": base["value"]}, threshold=0.1)
    assert any(not r.valid for r in drifted)


def test_count_min_never_undercounts_and_merges():
    """CM estimates are one-sided (never below the true count), close
    for heavy keys, and partials merged == single-shot sketch."""
    import numpy as np

    from data_linter_ray.state.sketches import CountMin, hash_array

    rng = np.random.RandomState(2)
    # zipf-ish stream: few heavy keys, long tail
    keys = rng.zipf(1.3, 200_000) % 10_000
    h = hash_array(keys.astype(np.int64))
    true = np.bincount(keys, minlength=10_000)

    cm = CountMin(width=4096, depth=5)
    cm.add_hashes(h)
    uniq = np.unique(keys)
    est = cm.estimate_hashes(hash_array(uniq.astype(np.int64)))
    assert (est >= true[uniq]).all()  # one-sided error
    # heavy hitters estimated within the eps*N bound
    heavy = uniq[true[uniq] > 1000]
    eps_n = np.e / 4096 * len(keys)
    assert (est[np.isin(uniq, heavy)] - true[heavy] <= eps_n).all()

    parts = [CountMin(4096, 5) for _ in range(4)]
    for i, p in enumerate(parts):
        p.add_hashes(h[i::4])
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert (acc.table == cm.table).all() and acc.n == cm.n

    rt = CountMin.from_bytes(cm.to_bytes())
    assert (rt.table == cm.table).all() and rt.n == cm.n


def test_reservoir_sample_uniform_and_mergeable():
    import numpy as np

    from data_linter_ray.state.sketches import ReservoirSample

    rs = ReservoirSample(k=50, seed=7)
    rs.add(range(1000))
    assert rs.n == 1000 and len(rs.values) == 50
    assert all(0 <= v < 1000 for v in rs.values)
    # determinism: same seed + same stream → same sample
    rs2 = ReservoirSample(k=50, seed=7)
    rs2.add(range(1000))
    assert rs.values == rs2.values

    # rough uniformity: mean of many independent samples near the
    # population mean (law of large numbers over 200 reservoirs)
    means = []
    for s in range(200):
        r = ReservoirSample(k=20, seed=s)
        r.add(range(1000))
        means.append(np.mean(r.values))
    assert abs(np.mean(means) - 499.5) < 25

    # merge: count preserved, k respected, values only from the union
    a = ReservoirSample(k=30, seed=1)
    a.add(range(0, 500))
    b = ReservoirSample(k=30, seed=2)
    b.add(range(500, 2000))
    a.merge(b)
    assert a.n == 2000 and len(a.values) == 30
    assert all(0 <= v < 2000 for v in a.values)
    # weighted union leans toward the bigger stream
    frac_b = sum(1 for v in a.values if v >= 500) / 30
    assert frac_b > 0.5


def test_reservoir_merge_without_replacement_uniformity():
    """Merge draws decrement the consumed side's remaining mass: with
    k=2 and two 2-item streams the merged pair is a uniform draw of 2
    from 4 — P(both from one side) = 1/6 each, P(one each) = 2/3. The
    fixed-probability variant this replaces gave 1/4 / 1/2 / 1/4."""
    from collections import Counter

    from data_linter_ray.state.sketches import ReservoirSample

    c = Counter()
    n_trials = 8000
    for seed in range(n_trials):
        a = ReservoirSample(k=2, seed=seed)
        a.add([1, 2])
        b = ReservoirSample(k=2, seed=seed + 77_777)
        b.add([3, 4])
        a.merge(b)
        c[sum(1 for v in a.values if v in (1, 2))] += 1
    # ~±0.02 noise at 8k trials; 1/4 vs 1/6 is a 0.083 separation
    assert abs(c[2] / n_trials - 1 / 6) < 0.03
    assert abs(c[0] / n_trials - 1 / 6) < 0.03
    assert abs(c[1] / n_trials - 2 / 3) < 0.03


def test_misra_gries_guarantee_and_merge():
    """Every value with frequency > n/(m+1) survives arbitrary batch
    splits and merges; summary size stays <= m; undercount <= n/(m+1)."""
    import numpy as np
    import pandas as pd

    from data_linter_ray.state.sketches import MisraGries

    rng = np.random.RandomState(5)
    stream = rng.zipf(1.5, 50_000) % 2_000  # heavy skew + long tail
    true = pd.Series(stream).value_counts()
    m = 63
    n = len(stream)
    heavy = set(true[true > n / (m + 1)].index)
    assert heavy  # the test data must actually contain heavy hitters

    # single-shot, batched, and merged summaries all keep the guarantee
    one = MisraGries(m)
    vc = pd.Series(stream).value_counts()
    one.add_counts(vc.index.to_numpy(), vc.to_numpy())
    assert len(one.counts) <= m and heavy <= set(one.candidates())

    parts = [MisraGries(m) for _ in range(7)]
    for i, p in enumerate(parts):
        chunk = pd.Series(stream[i::7]).value_counts()
        p.add_counts(chunk.index.to_numpy(), chunk.to_numpy())
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert acc.n == n
    assert len(acc.counts) <= m
    assert heavy <= set(acc.candidates())
    # undercount bound: kept counter >= true - n/(m+1)
    for v in acc.candidates():
        assert acc.counts[v] >= true[v] - n / (m + 1)


def test_misra_gries_rejects_bad_merge():
    import pytest

    from data_linter_ray.state.sketches import MisraGries

    with pytest.raises(ValueError):
        MisraGries(8).merge(MisraGries(16))
    with pytest.raises(ValueError):
        MisraGries(0)


def test_misra_gries_duplicate_labels_in_one_ingest():
    """Regression: ingesting a partial with REPEATED labels (Ray blocks
    concatenate several per-batch partials) must behave as if the
    duplicates were pre-summed — a heavy hitter split across duplicate
    rows may not be truncated away."""
    import numpy as np
    import pandas as pd

    from data_linter_ray.state.sketches import MisraGries

    m = 7
    # 20 distinct fillers force truncation; the heavy value 'H' arrives
    # as 5 duplicate rows of 300 each (1500 total, far above n/(m+1))
    vals = ["H"] * 5 + [f"f{i}" for i in range(20)]
    cnts = [300] * 5 + [60] * 20
    mg = MisraGries(m)
    mg.add_counts(np.array(vals, object), np.array(cnts))
    n = sum(cnts)
    assert mg.n == n
    assert 1500 > n / (m + 1)
    assert "H" in mg.candidates()
    assert len(mg.counts) <= m
    assert mg.counts["H"] <= 1500  # never overcounts

    # and equivalently when split across two merged summaries
    a, b = MisraGries(m), MisraGries(m)
    a.add_counts(np.array(vals[:3] + vals[5:15], object),
                 np.array(cnts[:3] + cnts[5:15]))
    b.add_counts(np.array(vals[3:5] + vals[15:], object),
                 np.array(cnts[3:5] + cnts[15:]))
    a.merge(b)
    assert "H" in a.candidates() and a.n == n


def test_bloom_filter_properties():
    """No false negatives ever; FP rate near the analytic bound at the
    design load; OR-merge equals bulk insert; byte roundtrip exact;
    geometry-mismatch merge raises. (Exercises state/bloom.py — the
    filter the referential pre-filter and Bloom decontam share.)"""
    import numpy as np
    import pytest as _pytest

    from data_linter_ray.state.bloom import BloomFilter

    rng = np.random.RandomState(7)
    added = rng.randint(0, 2**63, 50_000, dtype=np.int64).astype(np.uint64)
    other = rng.randint(0, 2**63, 50_000, dtype=np.int64).astype(np.uint64)
    other = other[~np.isin(other, added)]

    bf = BloomFilter(1 << 20, 7)  # ~0.6% FP at 50k keys / 1M bits
    bf.add_hashes(added)
    assert bf.contains_hashes(added).all()          # no false negatives
    fp = bf.contains_hashes(other).mean()
    assert fp < 0.02, fp

    a, b = BloomFilter(1 << 20, 7), BloomFilter(1 << 20, 7)
    a.add_hashes(added[:25_000])
    b.add_hashes(added[25_000:])
    a.merge(b)
    assert (a.bits == bf.bits).all()

    rt = BloomFilter.from_bytes(bf.to_bytes())
    assert (rt.bits == bf.bits).all() and rt.k == bf.k and rt.m == bf.m

    sized = BloomFilter.from_capacity(50_000, fpr=0.01)
    sized.add_hashes(added)
    assert sized.contains_hashes(added).all()
    assert sized.contains_hashes(other).mean() < 0.03

    with _pytest.raises(ValueError):
        a.merge(BloomFilter(1 << 21, 7))


def test_approx_value_counts_one_sided(ray_session, sf_dir):
    """Count-Min probe estimates never undercount the exact counts and
    stay within the eps*N overcount bound for every probed user id."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from data_linter_ray.functions.profile import approx_value_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )
    raw = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )["user_id"].to_pandas()
    probes = raw.value_counts().head(20).index.tolist() + [999_999_999]
    got = approx_value_counts(ds, "user_id", probes, width=1 << 14, depth=5)
    exact = raw.value_counts()
    N = len(raw)
    eps_bound = np.e / (1 << 14) * N * 3  # slack over the w.h.p. bound
    for v, est in zip(got["value"], got["n_est"]):
        true = int(exact.get(v, 0))
        assert est >= true, (v, est, true)
        assert est - true <= max(eps_bound, 1), (v, est, true)
