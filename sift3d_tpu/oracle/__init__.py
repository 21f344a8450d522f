from . import cpu_sift, cpu_match, fixtures  # noqa: F401
