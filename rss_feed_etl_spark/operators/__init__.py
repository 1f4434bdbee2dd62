from . import dedup, filters, joins, merges, similarity, textstats  # noqa: F401
