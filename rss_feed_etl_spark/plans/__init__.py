from . import filter_pipeline  # noqa: F401
