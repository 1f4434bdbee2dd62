from . import (  # noqa: F401
    dedup,
    enrichment,
    filters,
    joins,
    merges,
    multimodal,
    similarity,
    textstats,
)
