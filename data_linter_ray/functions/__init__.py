from data_linter_ray.functions import dedup, similarity, text  # noqa: F401
