from data_linter_ray.state.sketches import HyperLogLog, TDigest  # noqa: F401
