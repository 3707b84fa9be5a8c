"""data_linter_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch re-creation of the semantics of
moj-analytical-services/data_linter (reference: /root/reference) on top of
``ray.data.Dataset`` pipelines: zero-copy Arrow batches, ``map_batches``
check kernels, actor pools for stateful sketch stages, and
groupby/aggregate shuffles for uniqueness + referential checks.

Public surface:
    - :mod:`data_linter_ray.checks`      pure Arrow check kernels (no Ray)
    - :mod:`data_linter_ray.metadata`    table schema + constraint model
    - :mod:`data_linter_ray.config`      run config (land/pass/fail paths, tables)
    - :mod:`data_linter_ray.result`      ValidatorResult-shaped verdict model
    - :mod:`data_linter_ray.pipelines`   validate_dataset / run_validation
    - :mod:`data_linter_ray.functions`   dedup / text / similarity operators
"""

__version__ = "0.5.3"

from data_linter_ray.metadata import ColumnSpec, TableSchema  # noqa: F401
from data_linter_ray.result import ValidatorResult  # noqa: F401


def _quiet_unhashable_schema_warning() -> None:
    """Silence one upstream cosmetic warning, narrowly.

    ``pyarrow.Schema`` raises ``TypeError: unhashable type: 'dict'`` when
    the schema carries pandas metadata (every pandas-written parquet
    file), and Ray Data's ``unify_schemas`` tries ``set(schemas)`` as a
    fast path and WARNs on that failure before falling back to the
    correct slow path (transform_pyarrow.py:181, Ray 2.49). The fallback
    is taken either way — the message is pure noise on any
    pandas-authored input. Filter exactly that message, nothing else.
    """
    import logging

    class _F(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_F())


def _quiet_empty_bundle_schema_warning() -> None:
    """Silence the empty-block variant of the executor's schema-change
    warning, narrowly.

    Ray Data's own ``Sort`` / ``Aggregate`` all-to-all operators emit
    schema-less EMPTY blocks for boundary partitions that received no
    rows, and the streaming executor then warns "Operator produced a
    RefBundle with a different schema … new schema: ." for each one
    (streaming_executor_state.py:793, Ray 2.49). The empty block is
    harmless — downstream concat ignores it — and this repo's own
    exchanges already pin their schemas. Filter ONLY the empty-schema
    form; a genuine non-empty schema mismatch still warns.
    """
    import logging

    class _F(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "Operator produced a RefBundle with a different schema" in msg
                and "new schema: ." in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_F())


_quiet_unhashable_schema_warning()
_quiet_empty_bundle_schema_warning()
