from . import enrichment_pipeline, etl_pipeline, filter_pipeline  # noqa: F401
