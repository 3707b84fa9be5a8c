"""JSON-Schema validation of run configs.

The reference validates configs against a draft-07 schema
(``/root/reference/data_linter/validation.py:133``,
``data_linter/schemas/config-schema.json``). This schema is written from
scratch to the same *semantic* rules (required paths, flag types, table
sub-shape, ``fail-unknown-files.exceptions`` as a string list) — it is
not a copy of the reference file. Validation runs before the dataclass
construction, so shape errors (e.g. a dict where a bool belongs) surface
as ConfigError with a JSON-pointer-ish path instead of a late TypeError.
"""

from __future__ import annotations

_TABLE_SCHEMA = {
    "type": "object",
    "properties": {
        "required": {"type": "boolean"},
        "pattern": {"type": "string"},
        "metadata": {"type": ["string", "object"]},
        "expect-header": {"type": "boolean"},
        "headers-ignore-case": {"type": "boolean"},
        "row-limit": {"type": "integer", "minimum": 1},
        "allow-missing-cols": {"type": "boolean"},
        "allow-unexpected-data": {"type": "boolean"},
        "id-column": {"type": "string"},
        "pandas-kwargs": {"type": "object"},
        "log-verbosity": {"type": "integer", "minimum": 0},
        "ref-tables": {
            "type": "object",
            "additionalProperties": {"type": "string"},
        },
        "only-test-cols-in-metadata": {"type": "boolean"},
        "drift-baseline": {"type": "string"},
        "drift-threshold": {"type": "number", "minimum": 0},
        "profile": {"type": "boolean"},
    },
}

CONFIG_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["land-base-path", "fail-base-path", "log-base-path", "tables"],
    "properties": {
        "land-base-path": {"type": "string", "minLength": 1},
        "fail-base-path": {"type": "string", "minLength": 1},
        "pass-base-path": {"type": "string", "minLength": 1},
        "log-base-path": {"type": "string", "minLength": 1},
        "compress-data": {"type": "boolean"},
        "remove-tables-on-pass": {"type": "boolean"},
        "all-must-pass": {"type": "boolean"},
        "fail-no-files": {"type": "boolean"},
        "fail-unknown-files": {
            "type": "object",
            "properties": {
                "exceptions": {"type": "array", "items": {"type": "string"}}
            },
        },
        # frictionless / great-expectations: accepted by the reference's
        # config-schema.json:36-49 despite no validator module shipping —
        # dispatch raises KeyError (validators.get_validator mirrors it)
        "validator-engine": {
            "enum": [
                "ray", "pandas", "parquet", "frictionless", "great-expectations"
            ]
        },
        "validator-engine-params": {"type": "object"},
        "timestamp-partition-name": {"type": "string"},
        "tables": {
            "type": "object",
            "minProperties": 1,
            "additionalProperties": _TABLE_SCHEMA,
        },
    },
}


def validate_config_shape(d: dict) -> None:
    """jsonschema validation (no-op if jsonschema isn't importable —
    the dataclass checks still run afterwards either way)."""
    try:
        import jsonschema
    except ImportError:  # pragma: no cover
        return
    from data_linter_ray.config import ConfigError

    errors = sorted(
        jsonschema.Draft7Validator(CONFIG_SCHEMA).iter_errors(d),
        key=lambda e: list(e.absolute_path),
    )
    if errors:
        msgs = [
            "/".join(str(p) for p in e.absolute_path) + ": " + e.message
            for e in errors[:5]
        ]
        raise ConfigError("config schema: " + "; ".join(msgs))
