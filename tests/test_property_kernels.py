"""Hypothesis property tests for the round-4 kernels — pure-kernel
properties run hundreds of random cases; Ray-backed ops run a reduced
example budget (a Dataset round-trip per example is expensive)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _levenshtein(a: str, b: str) -> int:
    """Reference DP implementation (oracle for the vectorized check)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


short_text = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    min_size=0,
    max_size=12,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(short_text, short_text), min_size=1, max_size=8))
def test_dist_le1_matches_levenshtein(pairs):
    from data_linter_ray.functions.fuzzy import _dist_le1

    a = pa.array([p[0] for p in pairs])
    b = pa.array([p[1] for p in pairs])
    got = _dist_le1(a, b)
    for i, (x, y) in enumerate(pairs):
        d = _levenshtein(x, y)
        if d <= 1:
            assert got[i] == d, (x, y, got[i], d)
        else:
            assert got[i] == -1, (x, y, got[i], d)


@settings(max_examples=300, deadline=None)
@given(st.lists(short_text, min_size=1, max_size=10))
def test_entry_keys_block_all_dist1_pairs(strs):
    """Blocking completeness: any two strings within Levenshtein
    distance 1 MUST share a deletion-neighborhood entry key."""
    from data_linter_ray.functions.fuzzy import _entry_keys, _pad_matrix

    mat, lens = _pad_matrix(pa.array(strs))
    keys, ridx = _entry_keys(mat, lens)
    by_row = {}
    for k, r in zip(keys.tolist(), ridx.tolist()):
        by_row.setdefault(r, set()).add(k)
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            if _levenshtein(strs[i], strs[j]) <= 1:
                assert by_row.get(i, set()) & by_row.get(j, set()), (
                    strs[i], strs[j],
                )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=400,
    ),
    st.lists(st.floats(min_value=0.001, max_value=1.0), min_size=1, max_size=4),
)
def test_quantile_rank_rule_matches_numpy(values, fracs):
    """The kth-smallest rule (k = max(ceil(n·q),1)) against a plain
    sort — driver-side check of the same selection the distributed
    scans implement."""
    import math

    arr = np.array(values, dtype=np.float64)
    srt = np.sort(arr)
    n = len(arr)
    for q in fracs:
        k = max(math.ceil(n * q), 1)
        expect = srt[k - 1]
        got = np.partition(arr, k - 1)[k - 1]
        assert got == expect


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.floats(
            allow_nan=False, allow_infinity=False,
            min_value=-1e6, max_value=1e6,
        ),
        min_size=1,
        max_size=300,
    )
)
def test_exact_quantiles_distributed_matches_sort(ray_session, values):
    import math

    import ray

    from data_linter_ray.functions.quantiles import exact_quantiles

    qs = [0.1, 0.5, 0.9, 1.0]
    ds = ray.data.from_items([{"v": float(v)} for v in values]).repartition(3)
    got = exact_quantiles(ds, "v", qs, max_collect=8, max_rounds=4)
    srt = np.sort(np.array(values, dtype=np.float64))
    n = len(values)
    for q, val in zip(got["q"], got["value"]):
        k = max(math.ceil(n * q), 1)
        assert val == srt[k - 1], (q, val, srt[k - 1])
