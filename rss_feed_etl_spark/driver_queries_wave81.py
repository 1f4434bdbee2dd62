"""Wave-81 driver queries: Heaps'-law vocabulary growth curve and the
A/B sample-size planning table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import profiling, textstats

_HB = 20


def _q_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.heaps_law_curve(
        td.load_table(spark, sf_dir, "documents"), n_buckets=_HB
    )


_register(
    "heaps_law_curve",
    _q_heaps,
    rf"""
WITH ids AS (
  SELECT CAST(min(doc_id) AS BIGINT) i0, CAST(max(doc_id) AS BIGINT) i1
  FROM documents),
base AS (
  SELECT CAST((CAST(doc_id AS BIGINT) - i0) * {_HB} // (i1 - i0 + 1)
              AS BIGINT) AS b,
         unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents, ids WHERE trim(text) <> ''),
tpb AS (SELECT b, CAST(count(*) AS BIGINT) n_tok FROM base GROUP BY 1),
fb AS (SELECT tok, min(b) AS fb FROM base GROUP BY 1),
npb AS (SELECT fb AS b, CAST(count(*) AS BIGINT) n_new FROM fb GROUP BY 1),
j AS (
  SELECT tpb.b, n_tok, CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new
  FROM tpb LEFT JOIN npb ON tpb.b = npb.b),
cum AS (
  SELECT b, CAST(sum(n_tok) OVER w AS BIGINT) n_tokens_cum,
         CAST(sum(n_new) OVER w AS BIGINT) vocab_cum
  FROM j WINDOW w AS (ORDER BY b
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
e AS (
  SELECT *, first_value(n_tokens_cum) OVER wo AS n1,
         first_value(vocab_cum) OVER wo AS v1,
         max(n_tokens_cum) OVER () AS n2, max(vocab_cum) OVER () AS v2
  FROM cum WINDOW wo AS (ORDER BY b
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT b AS bucket, n_tokens_cum, vocab_cum,
       round(ln(CAST(v2 AS DOUBLE) / CAST(v1 AS DOUBLE))
             / ln(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6) AS beta_hat
FROM e
""",
)

_MDES = (0.01, 0.02, 0.05, 0.10)
_Z = 1.96 + 0.8416
_2ZZ = 2.0 * _Z * _Z


def _q_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.ab_sample_size_table(
        td.load_table(spark, sf_dir, "events"), mdes=_MDES
    )


_P = "(CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))"
_ROWS = " UNION ALL ".join(
    f"SELECT CAST({float(m)!r} AS DOUBLE) AS mde, round({_P}, 6) AS baseline_rate, "
    f"CAST(ceil(CAST({_2ZZ!r} AS DOUBLE) * {_P} * (1.0 - {_P}) "
    f"/ CAST({float(m) * float(m)!r} AS DOUBLE)) AS BIGINT) AS n_per_arm, "
    f"CAST(CASE WHEN 2 * CAST(ceil(CAST({_2ZZ!r} AS DOUBLE) * {_P} * (1.0 - {_P}) "
    f"/ CAST({float(m) * float(m)!r} AS DOUBLE)) AS BIGINT) <= n_users "
    f"THEN 1 ELSE 0 END AS INT) AS feasible_now FROM t"
    for m in _MDES
)

_register(
    "ab_sample_size_table",
    _q_power,
    f"""
WITH pu AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1),
t AS (
  SELECT CAST(count(*) AS BIGINT) n_users, CAST(sum(conv) AS BIGINT) n_conv
  FROM pu)
{_ROWS}
""",
)
