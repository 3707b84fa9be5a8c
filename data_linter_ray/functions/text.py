"""Text-analysis operators for training-data pipelines.

All operators are vectorized Arrow kernels inside ``map_batches`` (RE2
regexes — same engine DuckDB uses, so oracle SQL matches exactly):

  - token counting: whitespace tokens + a BPE-ish word/punct regex count
  - quality scoring: length / punctuation / digit / stopword signals
  - language ID: stopword-hit heuristic over a small per-language lexicon
  - fingerprinting: md5 content fingerprint (oracle-checkable) and a fast
    64-bit stable hash for dedup keys
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

WS = r"\s+"
BPE_ISH = r"\w+|[^\w\s]"
PUNCT = r"[^\w\s]"
DIGIT = r"[0-9]"

# tiny per-language stopword lexicons (public common words)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "für"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "sur"],
}


def _lang_pattern(words: list[str]) -> str:
    return r"\b(?:" + "|".join(words) + r")\b"


def token_count_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(… , n_tokens_ws, n_tokens_bpe) appended. Empty/whitespace-only
    strings count 0 whitespace tokens."""
    text = t[text_col]
    trimmed = pc.utf8_trim_whitespace(text)
    splits = pc.split_pattern_regex(trimmed, WS)
    n_ws = pc.if_else(
        pc.equal(trimmed, ""),
        pa.scalar(0, pa.int32()),
        pc.list_value_length(splits),
    )
    n_bpe = pc.count_substring_regex(text, BPE_ISH)
    return t.append_column("n_tokens_ws", pc.cast(n_ws, pa.int64())).append_column(
        "n_tokens_bpe", pc.cast(n_bpe, pa.int64())
    )


def quality_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: n_chars_q, n_punct, n_digits, n_stopwords, and
    punct_ratio (double, single division — deterministic)."""
    text = t[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, DIGIT), pa.int64())
    n_stop = pc.cast(
        pc.count_substring_regex(text, _lang_pattern(LANG_STOPWORDS["en"])), pa.int64()
    )
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    ratio = pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(denom, pa.float64()))
    for name, arr in [
        ("n_chars_q", n_chars),
        ("n_punct", n_punct),
        ("n_digits", n_digit),
        ("n_stopwords", n_stop),
        ("punct_ratio", ratio),
    ]:
        t = t.append_column(name, arr)
    return t


def langid_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: most stopword hits wins ("und" = undetermined
    when no lexicon hits). Vectorized: one RE2 count per language."""
    text = t[text_col]
    langs = list(LANG_STOPWORDS)
    scores = np.stack(
        [
            pc.fill_null(
                pc.count_substring_regex(pc.utf8_lower(text), _lang_pattern(ws)), 0
            ).to_numpy(zero_copy_only=False)
            for ws in LANG_STOPWORDS.values()
        ],
        axis=1,
    )
    best = scores.argmax(axis=1)
    hit = scores.max(axis=1) > 0
    pred = np.where(hit, np.array(langs, dtype=object)[best], "und")
    return t.append_column("lang_pred", pa.array(pred, type=pa.string()))


def fingerprint_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 hex fingerprint (exactly DuckDB's ``md5(text)``) + fast stable
    64-bit hash for shuffle keys. md5 is a per-value C call via hashlib —
    fine for fingerprint queries; the hot dedup path uses ``hash64``."""
    import pandas as pd

    s = t[text_col].to_pandas()
    md5 = s.map(
        lambda x: hashlib.md5(x.encode()).hexdigest() if isinstance(x, str) else None
    )
    h64 = pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=np.uint64)
    return t.append_column("fp_md5", pa.array(md5, type=pa.string())).append_column(
        "fp_hash64", pa.array(h64.astype(np.int64), type=pa.int64())
    )


# ---- Dataset-level wrappers ----------------------------------------------


def with_token_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        lambda t: token_count_table(t, text_col), batch_format="pyarrow"
    )


def with_quality(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(lambda t: quality_table(t, text_col), batch_format="pyarrow")


def with_langid(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(lambda t: langid_table(t, text_col), batch_format="pyarrow")


def with_fingerprint(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        lambda t: fingerprint_table(t, text_col), batch_format="pyarrow"
    )
