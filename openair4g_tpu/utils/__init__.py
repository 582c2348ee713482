from .rng import host_keys  # noqa: F401
