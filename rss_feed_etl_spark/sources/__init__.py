from . import csvio, parquet, rss  # noqa: F401
