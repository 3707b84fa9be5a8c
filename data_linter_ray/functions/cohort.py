"""Cohort retention analysis — the product-analytics staple.

``retention_matrix`` assigns every user to the cohort of their FIRST
active period (epoch time // period) and counts, for every
(cohort_period, period) cell, the distinct users active in that cell.

Scale shape (one exchange, everything else is combiner/driver-fold):

  per batch: distinct (user, period) pairs — a combiner, so a user
      with 10^6 events in a batch contributes ≤ one row per period —
      plus ``_part = hash(user) % P``.
  one :func:`~data_linter_ray.exchange.keyed_scatter_gather` exchange
      co-locates each user's pairs; the reduce de-dupes pairs across
      batches, derives the user's cohort (min period — co-located, so
      exact), and emits per-(cohort, period) COUNT PARTIALS.
  driver: sums the partials (rows = cohorts × periods, KB scale).

No driver-side user map, no broadcast: user cardinality can be 10^9+.
Periods are integers (epoch // period_s), so results hash-match SQL
exactly — no timestamp-rendering parity hazards.

Reference provenance: no analog in the reference (per-file validation
only); extends the engine's windowed-analytics family
(functions/window.py, timeseries.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from data_linter_ray.exchange import exchange_width, keyed_scatter_gather

_PART_SCHEMA = pa.schema(
    [
        ("cohort_period", pa.int64()),
        ("period", pa.int64()),
        ("n", pa.int64()),
    ]
)


def retention_matrix(
    ds: Dataset,
    user_col: str,
    ts_col: str,
    *,
    period_s: int = 604800,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """→ DataFrame(cohort_period, period, n_users), sorted; periods are
    ``epoch_seconds // period_s`` (epoch weeks by default). Null users
    and null timestamps are excluded."""
    P = num_partitions or exchange_width(ds)
    period_us = np.int64(period_s) * np.int64(1_000_000)

    user_t = ds.schema().base_schema.field(user_col).type

    def pair_partial(t: pa.Table) -> pa.Table:
        df = t.select([user_col, ts_col]).to_pandas().dropna()
        empty = pa.table(
            {
                "u": pa.array([], user_t),
                "p": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64()),
            }
        )
        if not len(df):
            return empty
        ts = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        pairs = pd.DataFrame({"u": df[user_col].to_numpy(), "p": ts // period_us})
        # hash-based pair dedupe: np.unique(axis=0) sort-unique
        # measured 5× slower on 10M-row batches
        pairs = pairs[~pairs.duplicated().to_numpy()]
        # partition on a hash of the user VALUE (any key type)
        part = (
            pd.util.hash_pandas_object(pairs["u"], index=False).to_numpy(np.uint64)
            % np.uint64(P)
        )
        return pa.table(
            {
                "u": pa.Array.from_pandas(pairs["u"], type=user_t),
                "p": pa.array(pairs["p"].to_numpy(np.int64)),
                "_part": pa.array(part.astype(np.int64)),
            }
        )

    def reduce_cell_counts(i: int, t: pa.Table | None) -> pa.Table:
        if t is None or t.num_rows == 0:
            return _PART_SCHEMA.empty_table()
        df = t.select(["u", "p"]).to_pandas().drop_duplicates()
        cohort = df.groupby("u", sort=False)["p"].transform("min")
        cells = (
            pd.DataFrame({"cohort_period": cohort, "period": df["p"]})
            .groupby(["cohort_period", "period"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(cells, schema=_PART_SCHEMA, preserve_index=False)

    mat = (
        ds.select_columns([user_col, ts_col])
        .map_batches(pair_partial, batch_format="pyarrow")
        .materialize()
    )
    parts = keyed_scatter_gather(mat, "_part", P, reduce_cell_counts)
    out = (
        pa.concat_tables(parts.iter_batches(batch_format="pyarrow", batch_size=None))
        .to_pandas()
        .groupby(["cohort_period", "period"], as_index=False)["n"]
        .sum()
        .rename(columns={"n": "n_users"})
        .sort_values(["cohort_period", "period"])
        .reset_index(drop=True)
    )
    return out


def windowed_active_counts(
    ds,
    key: str,
    time_col: str,
    *,
    window_days: int = 7,
    num_partitions: int | None = None,
):
    """EXACT rolling N-day active entities per day (WAU/MAU): for every
    calendar day in the observed span, the number of distinct keys with
    ≥ 1 event in the trailing ``window_days``-day window — the product
    metric sliding-distinct usually forces into approximation.

    Exact at scale without per-window dedupe: a key is active in the
    windows ending on days ``[d, d+N-1]`` for each of its activity days
    d, so its covered window-end days are a UNION OF INTERVALS. Per
    key, overlapping intervals merge in one vectorized pass (sorted
    distinct activity days; gaps > N−1 start a new run) and each run
    emits two delta rows (+1 at start, −1 after end). The day-indexed
    delta vector folds on the driver (span-bounded — days, not keys)
    and one cumsum yields every day's exact count.

    Scale shape: distinct (key, day) per-batch combiner → one key-hash
    :func:`~data_linter_ray.exchange.keyed_scatter_gather` exchange
    (all of a key's days co-locate; partitions hold disjoint key sets)
    → per-partition interval merge → tiny (day, delta) partials. Null
    keys/times excluded.

    → DataFrame(day [date], n_active), one row per day of the span,
    sorted.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from data_linter_ray.exchange import exchange_map_groups, exchange_width
    from data_linter_ray.state.sketches import hash_array

    P = num_partitions or exchange_width(ds)
    N = int(window_days)

    def pair_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select([key, time_col]).drop_null()
        days = pc.cast(pc.floor_temporal(t[time_col], unit="day"), pa.date32())
        g = pa.table({"k": t[key], "d": days}).group_by(["k", "d"]).aggregate([])
        h = hash_array(g["k"].combine_chunks()) % np.uint64(P)
        return g.append_column("_part", pa.array(h.astype(np.int64)))

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["k", "d"]).sort_values(
            ["k", "d"], kind="mergesort"
        )
        k = d["k"].to_numpy()
        day = d["d"].to_numpy().astype("datetime64[D]").astype(np.int64)
        n = len(d)
        if not n:
            return pd.DataFrame({"day": [], "delta": []})
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        # a new RUN starts at a new key or a gap the window can't bridge
        gap = np.empty(n, dtype=bool)
        gap[0] = True
        gap[1:] = (day[1:] - day[:-1]) > (N - 1)
        run_start = new_key | gap
        starts = np.flatnonzero(run_start)
        ends = np.append(starts[1:], n) - 1
        s_days = day[starts]                # first window-end covered
        e_days = day[ends] + (N - 1)        # last window-end covered
        out = pd.DataFrame(
            {
                "day": np.concatenate([s_days, e_days + 1]),
                "delta": np.concatenate(
                    [np.ones(len(starts), np.int64),
                     -np.ones(len(starts), np.int64)]
                ),
            }
        )
        return out.groupby("day", as_index=False)["delta"].sum()

    parts = exchange_map_groups(
        ds.select_columns([key, time_col]).map_batches(
            pair_partial, batch_format="pyarrow"
        ),
        "_part",
        P,
        deltas,
    ).to_pandas()
    if "day" not in parts.columns or not len(parts):
        return pd.DataFrame(columns=["day", "n_active"])
    fold = parts.groupby("day", as_index=True)["delta"].sum().sort_index()
    lo, hi = int(fold.index.min()), int(fold.index.max())
    grid = np.arange(lo, hi, dtype=np.int64)  # hi is the first zero day
    vec = np.zeros(hi - lo, np.int64)
    idx = fold.index.to_numpy(np.int64) - lo
    vec[idx[idx < len(vec)]] = fold.to_numpy(np.int64)[idx < len(vec)]
    counts = np.cumsum(vec)
    return pd.DataFrame(
        {
            "day": grid.astype("datetime64[D]"),
            "n_active": counts,
        }
    )
