"""The reference's "query" pipeline (§3.2, run_job_filter.py:257-388) as one
lazy DataFrame program.

Reference shape:  read whole StageData sheet → filter_by_date (P4) →
filter_empty_content (P5) → keyword exclusion (P6) → stamp AS_OF_DT (P8) →
append-mode: union with existing output, dedup keep-first by link (M4/A3) →
overwrite the output worksheet (S4).

Engine shape: the same relational query —

    SELECT *, as_of AS AS_OF_DT
    FROM stage
    WHERE published >= as_of - days_back
      AND <non-blank content cols>
      AND <no keyword matches>
    UNION (existing output)  -- new rows win per key
    QUALIFY row_number() OVER (PARTITION BY link ORDER BY priority) = 1

— declared once and planned by Catalyst, so the date/content/keyword
predicates push into the Parquet scan instead of following a full read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import filters
from ..operators.dedup import union_dedup_keep_first


def run_filter_pipeline(
    stage: DataFrame,
    existing: DataFrame | None = None,
    as_of: str | None = None,
    days_back: int = 7,
    content_cols: list[str] | None = None,
    exclude_keywords: dict[str, list[str]] | None = None,
    key: str = "link",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Compose P4 → P5 → P6 → P8 → (M4 append-dedup) lazily.

    ``as_of=None`` means production wall-clock; verified runs pass a fixed
    timestamp (the driver forbids nondeterminism in compared output).
    ``existing=None`` is overwrite mode (no union stage).
    """
    out = filters.filter_by_date(stage, "published", as_of, days_back)
    if content_cols:
        out = filters.filter_empty_content(out, content_cols)
    if exclude_keywords:
        out = filters.filter_keywords(out, exclude_keywords)
    out = filters.add_as_of(out, "AS_OF_DT", as_of)
    if existing is not None:
        out = union_dedup_keep_first(out, existing, key, tiebreak_cols)
    return out
