"""Vectorized scalar-field extraction from flat JSON string columns.

Event/telemetry tables routinely carry a JSON ``props`` column; pulling
one scalar out per row is the first step of every downstream aggregate.
No vectorized JSON parser ships in this environment (pyarrow's json
module reads files, not arrays), but scalar fields of FLAT json objects
are exactly regular — one RE2 ``pc.extract_regex`` pass per batch
extracts them at C speed with zero Python rows.

Supported value shapes per dtype:
  - ``int``    ``-?\\d+``
  - ``double`` ``-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?``
  - ``string`` ``"..."`` WITHOUT escaped quotes — the documented
    limitation; nested objects / escaped strings need a real parser
    stage (actor pool + json.loads), which this operator deliberately
    is not.

Missing key, null input, or non-matching value → null output (SQL
``json_extract`` semantics for absent paths).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_VALUE_RE = {
    "int": r"(?P<v>-?\d+)",
    "double": r"(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)",
    "string": r'"(?P<v>(?:[^"\\])*)"',
}

_CAST = {"int": pa.int64(), "double": pa.float64(), "string": pa.string()}


def extract_json_field(
    arr: pa.ChunkedArray | pa.Array, key: str, dtype: str = "int"
) -> pa.Array:
    """Extract ``key``'s scalar value from every flat-JSON string."""
    if dtype not in _VALUE_RE:
        raise ValueError(f"unsupported dtype: {dtype}")
    import re

    pattern = '"' + re.escape(key) + r'"\s*:\s*' + _VALUE_RE[dtype]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ex = pc.extract_regex(arr, pattern)
    # extract_regex yields a struct of the named captures, null where
    # the pattern misses
    vals = pc.struct_field(ex, "v")
    return pc.cast(vals, _CAST[dtype])


def with_json_field(
    ds: Dataset,
    json_col: str,
    key: str,
    *,
    dtype: str = "int",
    out_col: str | None = None,
) -> Dataset:
    """Append ``out_col`` (default the key name) with the extracted
    scalar — one streaming RE2 pass, zero shuffle."""
    out = out_col or key

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out, extract_json_field(t[json_col], key, dtype))

    return ds.map_batches(fn, batch_format="pyarrow")
