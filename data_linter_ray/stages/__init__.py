from data_linter_ray.stages.checker import BatchChecker, CheckPlan, VIOLATION_SCHEMA  # noqa: F401
