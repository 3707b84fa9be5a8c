from data_linter_ray.sources.readers import read_table_dataset  # noqa: F401
