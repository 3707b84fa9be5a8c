from data_linter_ray.pipelines.validate import TableValidationResult, validate_dataset  # noqa: F401
