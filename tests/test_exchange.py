"""Direct tests for the deterministic manual exchange
(exchange.keyed_scatter_gather / exchange_map_groups) — the primitive
every engine exchange now routes through."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from data_linter_ray.exchange import exchange_map_groups, keyed_scatter_gather


def _mk(parts, rows_per_part, n_blocks=4):
    n = parts * rows_per_part
    t = pa.table(
        {
            "v": pa.array(np.arange(n, dtype=np.int64)),
            "_part": pa.array(np.arange(n, dtype=np.int64) % parts),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks).materialize()


def test_partition_isolation_and_coverage(ray_session):
    mat = _mk(parts=5, rows_per_part=100)

    def reduce_fn(i, t):
        pv = t["_part"].to_numpy(zero_copy_only=False)
        assert (pv == i).all()  # partition i holds ONLY key i
        return pa.table(
            {"part": pa.array([i], pa.int64()), "n": pa.array([t.num_rows], pa.int64())}
        )

    out = (
        keyed_scatter_gather(mat, "_part", 5, reduce_fn, skip_empty=True)
        .to_pandas()
        .sort_values("part")
    )
    assert out["part"].tolist() == [0, 1, 2, 3, 4]
    assert out["n"].tolist() == [100] * 5


def test_skip_empty_partitions_never_reach_reduce(ray_session):
    # keys 0 and 4 only, width 5 → partitions 1-3 are empty and must be
    # skipped entirely (reduce_fn would crash on them)
    t = pa.table(
        {
            "v": pa.array([1, 2, 3, 4], pa.int64()),
            "_part": pa.array([0, 0, 4, 4], pa.int64()),
        }
    )
    mat = ray.data.from_arrow(t).repartition(2).materialize()

    def reduce_fn(i, tbl):
        assert tbl is not None and tbl.num_rows > 0
        return pa.table({"part": pa.array([i], pa.int64())})

    out = keyed_scatter_gather(mat, "_part", 5, reduce_fn, skip_empty=True).to_pandas()
    assert sorted(out["part"]) == [0, 4]


def test_width_one(ray_session):
    mat = _mk(parts=1, rows_per_part=50, n_blocks=3)
    out = keyed_scatter_gather(
        mat, "_part", 1,
        lambda i, t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
        skip_empty=True,
    ).to_pandas()
    assert out["n"].tolist() == [50]


def test_all_empty_returns_empty_dataset(ray_session):
    t = pa.table({"v": pa.array([], pa.int64()), "_part": pa.array([], pa.int64())})
    mat = ray.data.from_arrow(t).materialize()
    out = keyed_scatter_gather(
        mat, "_part", 4, lambda i, t: t, skip_empty=True
    )
    assert out.count() == 0


def test_exchange_map_groups_matches_sort_groupby(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n)),
            "x": pa.array(rng.integers(0, 1000, n)),
            "_part": pa.array(rng.integers(0, 40, n) * 0),  # filled below
        }
    )
    P = 8
    part = (t["k"].to_numpy() % P).astype(np.int64)
    t = t.drop_columns(["_part"]).append_column("_part", pa.array(part))
    ds = ray.data.from_arrow(t).repartition(5)

    def per_key_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", as_index=False)["x"].sum()

    got = (
        exchange_map_groups(ds, "_part", P, per_key_sum)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .groupby("k", as_index=False)["x"]
        .sum()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "x"]], exp)


def test_exchange_map_groups_pyarrow_mode(ray_session):
    t = pa.table(
        {
            "v": pa.array([1, 2, 3, 4], pa.int64()),
            "_part": pa.array([0, 1, 0, 1], pa.int64()),
        }
    )
    out = exchange_map_groups(
        ray.data.from_arrow(t),
        "_part",
        2,
        lambda tb: pa.table(
            {"s": pa.array([int(pa.compute.sum(tb["v"]).as_py())], pa.int64())}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    assert sorted(out["s"]) == [4, 6]  # {1,3} and {2,4}
