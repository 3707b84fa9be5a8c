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
