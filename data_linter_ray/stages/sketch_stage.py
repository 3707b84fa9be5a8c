"""Distribution-drift checks via streaming sketches (north-rule stage).

Pipeline shape (SURVEY.md §2.3, §7 step 7):

    ds ──► map_batches(SketchPartials, concurrency=(min,max))   # actor pool
              emits ONE partial-sketch row per (batch, column)
       ──► groupby("column").map_groups(merge)                  # KB-sized shuffle
       ──► per-column merged sketch → drift verdict vs baseline

The actor pool holds the compiled column plan (built once per actor in
``__init__``); per-batch partials are *emitted as data*, never
accumulated in actor state, so Ray task retries cannot double-count
(SURVEY.md §7.4). Partial sketches are a few KB — the merge shuffle is
negligible next to the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from data_linter_ray.state.sketches import KLL, HyperLogLog, TDigest, hash_array

SKETCH_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("kind", pa.string()),  # "tdigest" | "kll" | "hll"
        ("payload", pa.binary()),
        ("n", pa.int64()),
    ]
)

DEFAULT_QUANTILES = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)


class SketchPartials:
    """Actor-pool callable: per batch, one t-digest partial per numeric
    column and one HLL partial per key column."""

    def __init__(
        self,
        numeric_cols: list[str],
        key_cols: list[str],
        delta: int = 100,
        hll_p: int = 12,
        quantile_sketch: str = "tdigest",
        kll_k: int = 200,
    ):
        self.numeric_cols = numeric_cols
        self.key_cols = key_cols
        self.delta = delta
        self.hll_p = hll_p
        if quantile_sketch not in ("tdigest", "kll"):
            raise ValueError(f"unknown quantile sketch: {quantile_sketch}")
        self.quantile_sketch = quantile_sketch
        self.kll_k = kll_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols, kinds, payloads, ns = [], [], [], []
        for c in self.numeric_cols:
            arr = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            if self.quantile_sketch == "kll":
                sk = KLL(self.kll_k)
            else:
                sk = TDigest(self.delta)
            sk.add(arr)
            cols.append(c)
            kinds.append(self.quantile_sketch)
            payloads.append(sk.to_bytes())
            ns.append(len(arr))
        for c in self.key_cols:
            hll = HyperLogLog(self.hll_p)
            hll.add_hashes(hash_array(batch[c]))
            cols.append(c)
            kinds.append("hll")
            payloads.append(hll.to_bytes())
            ns.append(batch.num_rows)
        return pa.Table.from_arrays(
            [
                pa.array(cols, pa.string()),
                pa.array(kinds, pa.string()),
                pa.array(payloads, pa.binary()),
                pa.array(ns, pa.int64()),
            ],
            schema=SKETCH_SCHEMA,
        )


def _merge_group(df):
    """map_groups fn: fold all partials of one (column, kind) group."""
    import pandas as pd

    if len(df) == 0:
        # pin the empty-group output schema — an untyped empty block
        # downgrades the downstream dataset schema to <empty> (mixed
        # block schemas warning) and can bite later consumers
        return pd.DataFrame(
            {
                "column": pd.Series([], dtype=object),
                "kind": pd.Series([], dtype=object),
                "payload": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            }
        )
    kind = df["kind"].iloc[0]
    cls = {"tdigest": TDigest, "kll": KLL, "hll": HyperLogLog}[kind]
    acc = cls.from_bytes(df["payload"].iloc[0])
    for b in df["payload"].iloc[1:]:
        acc.merge(cls.from_bytes(b))
    return pd.DataFrame(
        {
            "column": [df["column"].iloc[0]],
            "kind": [kind],
            "payload": [acc.to_bytes()],
            "n": [int(df["n"].sum())],
        }
    )


def compute_sketches(
    ds: Dataset,
    numeric_cols: list[str],
    key_cols: list[str] | None = None,
    *,
    concurrency=None,
    batch_size: int | None = None,
    quantile_sketch: str = "tdigest",
) -> dict[str, dict]:
    """Run the sketch stage; returns {column: {"tdigest": TDigest}} /
    {"kll": KLL} / {"hll": HyperLogLog} merged results (KB-sized — safe
    on the driver). ``quantile_sketch`` selects t-digest or KLL for the
    numeric columns (both named by the north star)."""
    key_cols = key_cols or []
    needed = sorted(set(numeric_cols) | set(key_cols))
    kwargs: dict = {"batch_format": "pyarrow"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    partials = ds.select_columns(needed).map_batches(
        SketchPartials(numeric_cols, key_cols, quantile_sketch=quantile_sketch),
        **kwargs,
    )
    # partials are KB-sized rows (one per batch × column): collapse to a
    # single partition before the merge groupby so the sort never emits
    # empty partitions (the executor logs an empty-schema warning per
    # empty map_groups block and downgrades the dataset schema). At 100
    # TB the partial count is n_batches × n_cols — still MB-scale.
    merged = (
        partials.repartition(1)
        .groupby(["column", "kind"])
        .map_groups(_merge_group, batch_format="pandas")
    )
    out: dict[str, dict] = {}
    cls_by_kind = {"tdigest": TDigest, "kll": KLL, "hll": HyperLogLog}
    for row in merged.take_all():
        entry = out.setdefault(row["column"], {})
        entry[row["kind"]] = cls_by_kind[row["kind"]].from_bytes(row["payload"])
        entry[f"n_{row['kind']}"] = row["n"]
    return out


def save_baselines(sketches: dict[str, dict], path: str) -> str:
    """Persist merged sketches (the drift baseline) to one JSON file
    (payloads base64) — KB-sized, safe anywhere (local or s3://)."""
    import base64
    import json

    from data_linter_ray import fs

    out: dict = {}
    for col, entry in sketches.items():
        e: dict = {}
        if "tdigest" in entry:
            e["tdigest"] = base64.b64encode(entry["tdigest"].to_bytes()).decode()
        if "kll" in entry:
            e["kll"] = base64.b64encode(entry["kll"].to_bytes()).decode()
        if "hll" in entry:
            e["hll"] = base64.b64encode(entry["hll"].to_bytes()).decode()
        out[col] = e
    fs.write_text(path, json.dumps(out))
    return path


def load_baselines(path: str) -> dict[str, dict]:
    import base64
    import json

    from data_linter_ray import fs

    raw = json.loads(fs.read_text(path))
    out: dict[str, dict] = {}
    for col, e in raw.items():
        entry: dict = {}
        if "tdigest" in e:
            entry["tdigest"] = TDigest.from_bytes(base64.b64decode(e["tdigest"]))
        if "kll" in e:
            entry["kll"] = KLL.from_bytes(base64.b64decode(e["kll"]))
        if "hll" in e:
            entry["hll"] = HyperLogLog.from_bytes(base64.b64decode(e["hll"]))
        out[col] = entry
    return out


@dataclass
class DriftResult:
    column: str
    metric: str
    distance: float
    threshold: float

    @property
    def valid(self) -> bool:
        return self.distance <= self.threshold


def quantile_drift(
    current,
    baseline,
    quantiles=DEFAULT_QUANTILES,
) -> float:  # works on any sketch exposing quantile()/quantiles() (t-digest, KLL)
    """Normalized max quantile shift: max_q |Q_cur(q) − Q_base(q)| / IQR_base.

    Caveat: on small heavy-tailed columns the 1%/99% quantiles of a
    randomized KLL sketch carry sampling noise — prefer t-digest (whose
    centroids concentrate at the tails by design) for tail-sensitive
    drift, or restrict ``quantiles`` to the dense central range."""
    qc = current.quantiles(quantiles)
    qb = baseline.quantiles(quantiles)
    iqr = baseline.quantile(0.75) - baseline.quantile(0.25)
    scale = iqr if iqr > 0 else (abs(baseline.quantile(0.5)) or 1.0)
    return float(np.max(np.abs(qc - qb)) / scale)


def cardinality_drift(current: HyperLogLog, baseline: HyperLogLog) -> float:
    """Relative distinct-count change."""
    b = baseline.estimate() or 1.0
    return abs(current.estimate() - b) / b


def drift_check(
    ds: Dataset,
    baselines: dict[str, dict],
    *,
    numeric_cols: list[str] | None = None,
    key_cols: list[str] | None = None,
    threshold: float = 0.1,
    concurrency=None,
) -> list[DriftResult]:
    """Compare the dataset's sketches to stored baseline sketches."""
    numeric_cols = numeric_cols or [
        c for c, v in baselines.items() if "tdigest" in v or "kll" in v
    ]
    key_cols = key_cols or [c for c, v in baselines.items() if "hll" in v]
    wants_kll = any("kll" in v for v in baselines.values())
    current = compute_sketches(
        ds,
        numeric_cols,
        key_cols,
        concurrency=concurrency,
        quantile_sketch="kll" if wants_kll else "tdigest",
    )
    results: list[DriftResult] = []
    for col, base in baselines.items():
        cur = current.get(col, {})
        for qkind in ("tdigest", "kll"):
            if qkind in base and qkind in cur:
                results.append(
                    DriftResult(
                        col,
                        "quantile_shift",
                        quantile_drift(cur[qkind], base[qkind]),
                        threshold,
                    )
                )
        if "hll" in base and "hll" in cur:
            results.append(
                DriftResult(
                    col,
                    "cardinality_shift",
                    cardinality_drift(cur["hll"], base["hll"]),
                    threshold,
                )
            )
    return results
