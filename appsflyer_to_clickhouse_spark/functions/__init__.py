from .kernels import parse_datetime_lenient, null_sentinel_normalize  # noqa: F401
