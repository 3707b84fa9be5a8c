"""Run-level log collation + upload.

Re-creates the reference's main-log lifecycle
(``/root/reference/data_linter/logging_functions.py:24-69`` and
``validation.py:240-251``): every run collates a formatted log into a
StringIO buffer and uploads it to
``{log-base-path}/data-linter-main-logs/data-linter-{ts}.log`` — on
success AND on the error path before re-raising. The destination may be
local or ``s3://`` (via :mod:`data_linter_ray.fs`).
"""

from __future__ import annotations

import io
import logging
import time

from data_linter_ray import fs

_FMT = logging.Formatter(
    fmt="%(asctime)s | %(funcName)s | %(levelname)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
)


def logging_setup(name: str = "data_linter_ray") -> tuple[logging.Logger, io.StringIO]:
    """A logger writing to a fresh StringIO buffer (one per run)."""
    log = logging.getLogger(name)
    log.setLevel(logging.DEBUG)
    buf = io.StringIO()
    handler = logging.StreamHandler(buf)
    handler.setFormatter(_FMT)
    log.addHandler(handler)
    return log, buf


def teardown(log: logging.Logger, buf: io.StringIO) -> None:
    for h in list(log.handlers):
        if isinstance(h, logging.StreamHandler) and h.stream is buf:
            log.removeHandler(h)


def get_main_log_path(log_base_path: str, ts: int | None = None) -> str:
    ts = int(time.time()) if ts is None else ts
    return fs.join(log_base_path, "data-linter-main-logs", f"data-linter-{ts}.log")


def upload_log(buf: io.StringIO, log_path: str | None) -> None:
    """Write the collated run log (local or S3). Mirrors the reference's
    ``upload_log`` including the no-path degenerate case."""
    if not log_path:
        return
    fs.write_text(log_path, buf.getvalue())
