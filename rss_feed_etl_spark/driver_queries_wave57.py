"""Wave-57 driver queries: LLM response repair (reference F15/F16).

The repair ladder in ``functions/llm_repair.py`` mirrors the reference's
JSON+regex recovery (run_ats_enrichment.py:784-859,
src/utils/ats_matcher.py:79-127).  The oracle-checkable slice is the pure
regexp percentage ladder (``match_percentage_col``) — the ``from_json``
structured path is Spark-only and pytest-covered
(tests/test_llm_client_repair.py).

The query synthesizes the reference's four malformed-response classes
deterministically from the documents table (single-quoted pseudo-JSON,
free prose with a % mention, %-suffixed JSON string values, and no number
at all), then recovers the percentage with the identical regex on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .functions.llm_repair import match_percentage_col


def _q_llm_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents").select("doc_id")
    pct = (F.col("doc_id") % 101).cast("string")
    resp = (
        F.when(
            (F.col("doc_id") % 4) == 0,
            F.concat(
                F.lit("[{'job_number': 1, 'match_percentage': "),
                pct,
                F.lit("%}]"),
            ),
        )
        .when(
            (F.col("doc_id") % 4) == 1,
            F.concat(
                F.lit("I think this is about a "), pct, F.lit("% match overall.")
            ),
        )
        .when(
            (F.col("doc_id") % 4) == 2,
            F.concat(
                F.lit('{"match_percentage": "'),
                pct,
                F.lit('%", "missing_skills": []}'),
            ),
        )
        .otherwise(F.lit("the model refused to answer"))
    )
    return docs.select(
        "doc_id",
        F.coalesce(match_percentage_col(resp), F.lit(-1.0)).alias("match_pct"),
    )


_register(
    "llm_response_repair",
    _q_llm_repair,
    r"""
WITH r AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN '[{''job_number'': 1, ''match_percentage'': '
                       || CAST(doc_id % 101 AS VARCHAR) || '%}]'
           WHEN 1 THEN 'I think this is about a '
                       || CAST(doc_id % 101 AS VARCHAR) || '% match overall.'
           WHEN 2 THEN '{"match_percentage": "'
                       || CAST(doc_id % 101 AS VARCHAR) || '%", "missing_skills": []}'
           ELSE 'the model refused to answer'
         END AS resp
  FROM documents),
x AS (
  SELECT doc_id,
         regexp_extract(resp, 'match_percentage"?:?\s*"?(\d+)', 1) AS labeled,
         regexp_extract(resp, '(\d+)\s*%', 1) AS anywhere
  FROM r),
y AS (
  SELECT doc_id,
         CAST(CASE WHEN labeled <> '' THEN labeled
                   WHEN anywhere <> '' THEN anywhere END AS DOUBLE) AS v
  FROM x)
SELECT doc_id,
       coalesce(CASE WHEN v IS NOT NULL THEN least(100.0, v) END, -1.0) AS match_pct
FROM y
""",
)
