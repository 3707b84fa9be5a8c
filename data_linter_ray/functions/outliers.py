"""Per-group statistical outlier detection (z-score filter).

Quality gate for numeric telemetry / reward / score columns: flag rows
whose value deviates more than ``z`` standard deviations from their
group's mean. Two-phase moments — the canonical broadcast-small
composition:

  phase 1: per-batch partial (n, Σx, Σx²) per group inside
      ``map_batches`` → tiny ``groupby(group).sum`` over the partials
      (rows = number of groups, not data rows) → driver computes
      mean/std per group → ``ray.put`` broadcast.
  phase 2: one vectorized filter pass over the pruned columns — no
      shuffle of the big table at all.

Population std (ddof=0) matches SQL ``stddev_pop``. Null group keys
and null values are excluded (a null key has no population to deviate
from — same convention as SQL's inner join against the moments CTE).
Group cardinality must be small enough to broadcast (enum-like group
keys); that is the documented assumption, same as the engine's
referential broadcast path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset


def group_moments(ds: Dataset, value_col: str, by: str) -> pd.DataFrame:
    """→ DataFrame(by, n, mean, std) — exact, two-level aggregated."""

    def partial(t: pa.Table) -> pa.Table:
        # output schema pinned explicitly so empty / int-valued batches
        # can't emit a different block schema than their siblings
        key_type = t.schema.field(by).type
        df = t.select([by, value_col]).to_pandas()
        df = df.dropna(subset=[by, value_col])
        if not len(df):
            return pa.table(
                {
                    by: pa.array([], key_type),
                    "_n": pa.array([], pa.int64()),
                    "_s": pa.array([], pa.float64()),
                    "_ss": pa.array([], pa.float64()),
                }
            )
        x = df[value_col].to_numpy(np.float64)
        g = df.groupby(by, dropna=False, sort=False)
        agg = pd.DataFrame(
            {
                "_n": g[value_col].size(),
                "_s": g[value_col].sum(),
                "_ss": pd.Series(x * x, index=df.index).groupby(df[by], sort=False).sum(),
            }
        ).reset_index()
        return pa.table(
            {
                by: pa.array(agg[by], key_type),
                "_n": pa.array(agg["_n"], pa.int64()),
                "_s": pa.array(agg["_s"], pa.float64()),
                "_ss": pa.array(agg["_ss"], pa.float64()),
            }
        )

    # the partial table holds one row per (batch, group) — KB scale for
    # enum-like groups — so the final fold is a driver-side pandas
    # groupby, not a distributed exchange (saves an all-to-all plus its
    # aggregator-actor startup; same pattern as profile/quantiles)
    batches = [
        b.to_pandas()
        for b in ds.select_columns([by, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    allp = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame(
        {by: [], "_n": [], "_s": [], "_ss": []}
    )
    parts = (
        allp.groupby(by, as_index=False, sort=True)[["_n", "_s", "_ss"]]
        .sum()
        .rename(columns={"_n": "sum(_n)", "_s": "sum(_s)", "_ss": "sum(_ss)"})
    )
    n = parts["sum(_n)"].to_numpy(np.float64)
    s = parts["sum(_s)"].to_numpy(np.float64)
    ss = parts["sum(_ss)"].to_numpy(np.float64)
    mean = s / np.maximum(n, 1)
    var = np.maximum(ss / np.maximum(n, 1) - mean * mean, 0.0)
    return pd.DataFrame(
        {by: parts[by], "n": n.astype(np.int64), "mean": mean, "std": np.sqrt(var)}
    )


def zscore_outliers(
    ds: Dataset,
    value_col: str,
    by: str,
    *,
    z: float = 3.0,
    keep_cols: list[str] | None = None,
) -> Dataset:
    """Rows with |value − mean(group)| > z·std(group). Groups with
    std == 0 emit nothing (every value identical ⇒ no outliers)."""
    mom = group_moments(ds, value_col, by)
    stats_ref = ray.put(
        {k: (m, sd) for k, m, sd in zip(mom[by], mom["mean"], mom["std"])}
    )
    cols = sorted(set([by, value_col] + (keep_cols or [])))

    # plain task function, NOT an actor pool: the only per-worker state
    # is one ray.get of a KB-scale dict, which the object store serves
    # from the local plasma cache after the first batch — an actor pool
    # here costs ~100-200 ms startup per actor for no win (measured:
    # 2.9 s → 0.9 s on the sf0.1 bench query)
    def zfilter(t: pa.Table) -> pa.Table:
        stats = ray.get(stats_ref)
        df = t.select(cols).to_pandas()
        # vectorized lookup (Series.map over a dict-per-row lambda
        # would be per-row Python)
        mean = df[by].map({k: v[0] for k, v in stats.items()}).to_numpy(np.float64)
        std = df[by].map({k: v[1] for k, v in stats.items()}).to_numpy(np.float64)
        v = df[value_col].to_numpy(np.float64)
        mask = (std > 0) & (np.abs(v - mean) > z * std)
        return pa.Table.from_pandas(df[mask], preserve_index=False)

    return ds.select_columns(cols).map_batches(zfilter, batch_format="pyarrow")
