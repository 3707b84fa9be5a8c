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

__version__ = "0.3.0"

from data_linter_ray.metadata import ColumnSpec, TableSchema  # noqa: F401
from data_linter_ray.result import ValidatorResult  # noqa: F401
