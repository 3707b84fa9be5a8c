"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side on DuckDB, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        df = obj.to_pandas()
        if len(df) == 0 and len(df.columns) == 0 and hasattr(obj, "schema"):
            # Ray's to_pandas drops columns on an all-empty Dataset;
            # rebuild the empty frame from the Dataset schema
            sch = obj.schema()
            names = getattr(sch, "names", None) or []
            df = pd.DataFrame(columns=list(names))
        return df
    raise TypeError(type(obj))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = {n for n in os.environ.get("CHECK_ONLY", "").split(",") if n}
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        got = normalize(to_pandas(fn(sf)))
        t_engine = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name}: rows={len(got)} (no oracle — rows-only) [{t_engine:.1f}s]")
            continue
        t0 = time.monotonic()
        exp = normalize(con.execute(oracles[name]).df())
        t_oracle = time.monotonic() - t0
        status = []
        if list(got.columns) != list(exp.columns):
            status.append(f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}")
        elif len(got) and len(exp):
            # dtype parity matters: a dtype-sensitive value hash (the
            # driver's) diverges on e.g. int64-vs-float64 even when every
            # value compares equal (round-3 quantized_embeddings red row).
            # Zero-row results carry no values to hash — skip there (the
            # schema-rebuilt empty frame is untyped by construction).
            dt = [
                f"{c}: engine={got[c].dtype} oracle={exp[c].dtype}"
                for c in got.columns
                if str(got[c].dtype) != str(exp[c].dtype)
            ]
            if dt:
                status.append("DTYPE " + "; ".join(dt))
        if len(got) != len(exp):
            status.append(f"ROWS got={len(got)} exp={len(exp)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status.append("VALUES " + str(e).split("\n")[0])
        if status:
            failures += 1
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(
                f"  ok {name}: {len(got)} rows "
                f"[engine {t_engine:.1f}s, oracle {t_oracle:.1f}s]"
            )
    print("entry():", len(to_pandas(entrymod.entry())), "rows")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
