"""Validator-engine registry + single-file validator classes.

Reference parity (§2.10 / §3.3): ``get_validator = {"pandas":
PandasValidator, "parquet": ParquetValidator}`` selected by config
``validator-engine`` (``/root/reference/data_linter/validation.py:58-61``)
and the library single-file flow
(``pv = PandasValidator(filepath, table_params, metadata);
pv.read_data_and_validate(); pv.valid; pv.response.get_result()``,
README.md:114-134). Our "ray" engine replaces "pandas" (same check
semantics, distributed execution); the name "pandas" is accepted as an
alias. ``validator-engine-params`` kwargs (log_verbosity, ...) pass
through the constructor, as in the reference.
"""

from __future__ import annotations

from typing import Optional, Union

from data_linter_ray.metadata import TableSchema
from data_linter_ray.result import ValidatorResult


class BaseTableValidator:
    """Reference ``BaseTableValidator`` surface (base.py:105-171)."""

    def __init__(self, filepath: str, table_params: dict, metadata: Union[dict, str, TableSchema], **kwargs):
        self.filepath = filepath
        self.table_params = table_params or {}
        if isinstance(metadata, TableSchema):
            self.schema = metadata
        elif isinstance(metadata, dict):
            self.schema = TableSchema.from_dict(metadata)
        else:
            self.schema = TableSchema.from_json(metadata)
        self.response = ValidatorResult()

    @property
    def valid(self) -> bool:
        return self.response.result["valid"]

    def get_response_dict(self) -> dict:
        return self.response.get_result()

    def read_data_and_validate(self):  # pragma: no cover - abstract
        raise NotImplementedError("Needs to be overwritten")

    def write_validation_errors_to_log(self):
        import logging

        if not self.valid:
            logging.getLogger("root").error(
                "Table failed validation. Col failures: %s.",
                self.response.get_names_of_column_failures(),
            )

    def write_validation_result_to_log(self, log=None):
        """Reference base.py:136-146 parity: dump the full response dict
        to the given logger at info level."""
        import json
        import logging

        (log or logging.getLogger("root")).info(
            json.dumps(self.response.get_result(), indent=2, default=str)
        )


class RayValidator(BaseTableValidator):
    """Full-data validator on Ray (the reference PandasValidator role)."""

    def __init__(self, filepath, table_params, metadata, log_verbosity: Optional[int] = None, ignore_missing_cols: bool = False, **kwargs):
        super().__init__(filepath, table_params, metadata)
        self.log_verbosity = self.table_params.get("log_verbosity", log_verbosity)
        self.ignore_missing_cols = ignore_missing_cols
        self.result = None

    def read_data_and_validate(self):
        from data_linter_ray.pipelines.validate import validate_dataset
        from data_linter_ray.sources.readers import read_table_dataset

        try:
            ds = read_table_dataset(self.filepath, self.schema, self.table_params)
            self.result = validate_dataset(
                ds,
                self.schema,
                id_column=self.table_params.get("id-column"),
                allow_missing_cols=self.table_params.get(
                    "allow-missing-cols", self.ignore_missing_cols
                ),
                allow_unexpected_data=self.table_params.get("allow-unexpected-data", False),
                row_limit=self.table_params.get("row-limit"),
                log_verbosity=self.log_verbosity,
            )
            self.response = self.result.response
        except Exception:  # noqa: BLE001 — reference captures parse errors
            import traceback

            self.response.add_table_test(
                "parse_data_to_pandas",
                {"valid": False, "traceback": traceback.format_exc()},
            )


class ParquetValidator(BaseTableValidator):
    """Schema-conformance validator (reference ParquetValidator role)."""

    def read_data_and_validate(self):
        from data_linter_ray.stages.schema_conformance import validate_parquet_schema

        self.response = validate_parquet_schema(self.filepath, self.schema)


class _MissingValidatorModule(dict):
    """Registry matching the reference's dispatch failure shape: the
    config schema accepts the ``frictionless`` / ``great-expectations``
    engine names but no validator module ships for them, so lookup
    raises KeyError exactly like the reference's bare ``get_validator``
    dict (reference validation.py:58-61 + config-schema.json:36-49) —
    ours just says why."""

    _ACCEPTED_UNIMPLEMENTED = ("frictionless", "great-expectations")

    def __missing__(self, key):
        if key in self._ACCEPTED_UNIMPLEMENTED:
            raise KeyError(
                f"validator-engine '{key}' is accepted by the config schema "
                "but no such validator module is installed (reference "
                "parity: data_linter ships only pandas/parquet validators)"
            )
        raise KeyError(key)


get_validator = _MissingValidatorModule(
    {
        "ray": RayValidator,
        "pandas": RayValidator,  # alias: same semantics, Ray execution
        "parquet": ParquetValidator,
    }
)
