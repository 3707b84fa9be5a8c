"""PII detection and redaction for training-data curation.

Scanning and scrubbing personally-identifiable strings is a standard
pre-training hygiene pass (emails, phone numbers, IP addresses,
SSN-shaped ids). Both operators are single-pass vectorized Arrow
kernels inside ``map_batches`` — RE2 regexes via
``pyarrow.compute.count_substring_regex`` / ``replace_substring_regex``,
the same engine DuckDB embeds, so the driver's SQL oracle reproduces
counts and redacted text byte-exactly.

Scale shape: embarrassingly parallel (doc-local), zero shuffles, zero
state; throughput is the regex kernel over zero-copy batches. Patterns
are module constants compiled once inside Arrow's kernel cache — no
per-batch setup cost, so a plain function (not an actor pool) is the
right stage shape.

Reference has no PII pass (validation-only linter); this extends the
engine per the brief's training-data-pipeline mandate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# RE2-compatible (no backrefs / lookarounds) — portable to DuckDB verbatim.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (pattern, replacement token)
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}

#: redaction order matters: ssn/phone before ipv4 would not collide, but
#: an SSN is also a phone-shaped string prefix — apply the most specific
#: (longest, most-anchored) patterns first so one kind claims each span.
REDACT_ORDER = ["email", "ssn", "phone", "ipv4"]


def pii_count_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Append one ``n_<kind>`` int64 count per PII kind plus a
    ``has_pii`` bool. Non-overlapping match counts — identical to
    DuckDB ``len(regexp_extract_all(text, pattern))``."""
    text = t[text_col]
    total = None
    for kind, (pat, _) in PII_PATTERNS.items():
        n = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
        t = t.append_column(f"n_{kind}", n)
        total = n if total is None else pc.add(total, n)
    return t.append_column("has_pii", pc.greater(total, 0))


def redact_table(t: pa.Table, text_col: str = "text", out_col: str = "text_redacted") -> pa.Table:
    """Append ``out_col`` with every PII match replaced by its token,
    applied in :data:`REDACT_ORDER` (specific→general). Equals chained
    DuckDB ``regexp_replace(..., 'g')`` calls in the same order."""
    red = t[text_col]
    for kind in REDACT_ORDER:
        pat, token = PII_PATTERNS[kind]
        red = pc.replace_substring_regex(red, pat, token)
    return t.append_column(out_col, red)


def with_pii_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        lambda t: pii_count_table(t, text_col), batch_format="pyarrow"
    )


def with_redaction(ds: Dataset, text_col: str = "text", out_col: str = "text_redacted") -> Dataset:
    return ds.map_batches(
        lambda t: redact_table(t, text_col, out_col), batch_format="pyarrow"
    )
