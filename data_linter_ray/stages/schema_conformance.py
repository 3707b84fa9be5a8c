"""Parquet schema conformance (reference M16 parity).

Re-creates ``ParquetValidator.read_data_and_validate``
(``/root/reference/data_linter/validators/parquet_validator.py:49-81``):
compare the file's footer schema against the schema derived from table
metadata — exact-equality verdict plus three diffs with the reference's
result keys (``cols_in_meta_not_in_file``, ``cols_in_file_not_in_meta``,
``cols_with_different_types``) under the table-level test name
``check_schema_conforms``.

Runs footer-only (no data scan); for a multi-file table each fragment
gets its own verdict row — at scale this is a driver-side metadata
operation, or a ``map_batches`` over a file-listing dataset when there
are millions of fragments.

Deviation from the reference (deliberate): the reference zips schemas
positionally and raises IndexError when the file has fewer columns; we
compare positionally over the common prefix and report the remainder
through the name diffs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from data_linter_ray.metadata import TableSchema
from data_linter_ray.result import ValidatorResult

CHECK_NAME = "check_schema_conforms"


def read_parquet_schema(filepath: str) -> pa.Schema:
    return pq.read_schema(filepath).remove_metadata()


def schema_conformance_result(
    file_schema: pa.Schema, schema: TableSchema | pa.Schema
) -> dict:
    meta_schema = (
        schema.remove_metadata()
        if isinstance(schema, pa.Schema)
        else schema.arrow_schema().remove_metadata()
    )
    # the reference compares schemas built without nullability annotations;
    # normalize both sides to nullable fields so only name/type/order count
    def norm(s: pa.Schema) -> pa.Schema:
        return pa.schema([pa.field(f.name, f.type) for f in s])

    file_schema = norm(file_schema)
    meta_schema = norm(meta_schema)
    metas_match = file_schema.equals(meta_schema)
    meta_names = [f.name for f in meta_schema]
    file_names = [f.name for f in file_schema]
    diffs = {
        c.name: {
            "meta_field": str(meta_schema[i].type),
            "table_field": str(file_schema[i].type),
        }
        for i, c in enumerate(meta_schema)
        if i < len(file_schema) and not meta_schema[i].equals(file_schema[i])
    }
    return {
        "valid": metas_match,
        "cols_in_meta_not_in_file": sorted(set(meta_names) - set(file_names)),
        "cols_in_file_not_in_meta": sorted(set(file_names) - set(meta_names)),
        "cols_with_different_types": diffs,
    }


def validate_parquet_schema(filepath: str, schema: TableSchema) -> ValidatorResult:
    """One file → reference-shaped ValidatorResult with the
    ``check_schema_conforms`` table test."""
    response = ValidatorResult()
    response.add_table_test(
        CHECK_NAME, schema_conformance_result(read_parquet_schema(filepath), schema)
    )
    return response
