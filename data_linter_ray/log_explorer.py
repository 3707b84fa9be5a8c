"""Log-explorer utilities (reference parity:
``/root/reference/data_linter/log_explorer_utils.py``).

Summaries over a run's per-table JSON logs: overall validity, fail
count/percentage, per-table fail percentage (reference A5 aggregations),
failed-file listing, and per-file error lookup sorted newest-first
(reference J2/O4). Returns plain DataFrames/dicts instead of IPython
Markdown — notebook rendering is the caller's concern, and the same
summaries can be produced distributed (``Dataset.groupby``) when log
volume outgrows one process.
"""

from __future__ import annotations

import json

import pandas as pd

from data_linter_ray import fs
from data_linter_ray.config import load_and_validate_config


def load_table_logs(config_or_path, table_name: str = "") -> pd.DataFrame:
    """One row per (table, file) validation log entry (log path may be
    local or ``s3://``)."""
    config = (
        config_or_path
        if not isinstance(config_or_path, (str, dict))
        else load_and_validate_config(config_or_path)
    )
    root = fs.join(config.log_base_path, "tables", table_name)
    rows = []
    for fp in fs.list_files(root, exclude_zero_byte=False):
        if not fp.endswith(".json"):
            continue
        e = json.loads(fs.read_text(fp))
        rows.append(
            {
                "table-name": e.get("table-name"),
                "valid": bool(e.get("valid")),
                "original-path": e.get("original-path"),
                "archived-path": e.get("archived-path"),
                "response": e.get("response"),
                "log-path": fp,
            }
        )
    return pd.DataFrame(rows)


def summary_of_all_tables(config_or_path) -> dict:
    """Overall + per-table fail summary (reference
    ``summary_of_all_tables`` measures, as a dict)."""
    df = load_table_logs(config_or_path)
    if df.empty:
        return {"overall_valid": True, "fail_count": 0, "fail_percentage": 0.0, "tables": {}}
    total = len(df)
    fails = int((~df["valid"]).sum())
    tables = {}
    for name, sub in df.groupby("table-name"):
        t_fails = int((~sub["valid"]).sum())
        tables[name] = {
            "fail_count": t_fails,
            "fail_percentage": (t_fails / len(sub)) * 100,
        }
    return {
        "overall_valid": bool(df["valid"].all()),
        "fail_count": fails,
        "fail_percentage": (fails / total) * 100,
        "tables": tables,
    }


def get_failed_files(config_or_path, table_name: str = "") -> pd.DataFrame:
    df = load_table_logs(config_or_path, table_name)
    if df.empty:
        return df
    return df[~df["valid"]][["table-name", "original-path"]].reset_index(drop=True)


def get_all_errors_for_file(config_or_path, file_path: str) -> pd.DataFrame:
    """All log entries for one source file, newest first (reference sorts
    by the timestamp embedded in the log filename; ours sorts by log file
    mtime — same ordering intent without filename parsing)."""
    df = load_table_logs(config_or_path)
    if df.empty:
        return df
    hits = df[df["original-path"] == file_path].copy()
    hits["ts"] = hits["log-path"].map(fs.mtime)
    return hits.sort_values("ts", ascending=False).reset_index(drop=True)
