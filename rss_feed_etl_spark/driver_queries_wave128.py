"""Driver-contract queries, wave 128: posting-list compression planning
and the analytic LSH (bands, rows) planner.

Reference anchor: the reference keeps its keyword index in pandas
memory (src/utils/ats_matcher.py); at corpus scale the index IS the
storage bill, and these two advisors price the posting encodings and
the near-dup banding before a byte is written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import dedup, retrieval

# --- posting-list compression plan --------------------------------------------------


def _q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return retrieval.postinglist_compression_plan(docs)


_register(
    "postinglist_compression_plan",
    _q_postings,
    r"""
WITH pres AS (
  SELECT DISTINCT doc_id AS doc, tok AS term FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
    FROM documents) WHERE tok <> ''),
u AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS U FROM documents),
gaps AS (
  SELECT term, doc,
         doc - coalesce(lag(doc) OVER (PARTITION BY term ORDER BY doc), -1)
           AS gap
  FROM pres),
g2 AS (SELECT term,
              CAST(8 * ceil(length(bin(greatest(gap, 1))) / 7.0) AS BIGINT)
                AS vbits
       FROM gaps),
terms AS (SELECT term, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(vbits) AS BIGINT) AS varint_total
          FROM g2 GROUP BY 1),
scored AS (
  SELECT *,
         ntile(10) OVER (ORDER BY n ASC, term ASC) AS df_bucket,
         CAST((length(bin(CAST(floor(U / n) AS BIGINT))) + 2) * n AS BIGINT)
           AS ef_bits_term,
         U AS bitmap_bits_term
  FROM terms, u),
agg AS (
  SELECT df_bucket,
         CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(n) AS BIGINT) AS n_postings,
         round(CAST(sum(varint_total) AS DOUBLE) / sum(n), 6) AS varint_bits,
         round(CAST(sum(ef_bits_term) AS DOUBLE) / sum(n), 6) AS ef_bits,
         round(CAST(sum(bitmap_bits_term) AS DOUBLE) / sum(n), 6)
           AS bitmap_bits
  FROM scored GROUP BY 1)
SELECT CAST(df_bucket AS BIGINT) AS df_bucket,
       n_terms, n_postings, varint_bits, ef_bits, bitmap_bits,
       CASE WHEN varint_bits <= ef_bits AND varint_bits <= bitmap_bits
            THEN 'varint'
            WHEN ef_bits <= bitmap_bits THEN 'elias_fano'
            ELSE 'bitmap' END AS best_encoding
FROM agg
""",
)


# --- analytic LSH parameter plan ----------------------------------------------------

_LSH_T = 0.5
_LSH_CAND = ((4, 4), (8, 4), (16, 2), (8, 8), (32, 2), (16, 4), (4, 8), (2, 16))
_LSH_STEP = 0.05


def _q_lsh_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_param_plan(
        spark, threshold=_LSH_T, candidates=_LSH_CAND, grid_step=_LSH_STEP
    )


_LSH_VALUES = ", ".join(f"({b}, {r})" for b, r in _LSH_CAND)
_LSH_NMID = int(round(1.0 / _LSH_STEP))

_register(
    "lsh_param_plan",
    _q_lsh_plan,
    f"""
WITH cand AS (SELECT * FROM (VALUES {_LSH_VALUES}) t(bands, rows)),
mids AS (SELECT (CAST(unnest(range({_LSH_NMID})) AS DOUBLE) + 0.5)
                * CAST({_LSH_STEP} AS DOUBLE) AS s),
grid AS (SELECT bands, rows, s,
                round(exp(rows * ln(s)), 9) AS sr
         FROM cand CROSS JOIN mids),
pp AS (SELECT bands, rows, s,
              round(CAST(1.0 AS DOUBLE)
                    - exp(bands * ln(CAST(1.0 AS DOUBLE) - sr)), 9) AS p
       FROM grid),
sc AS (SELECT bands, rows,
              CASE WHEN s < {_LSH_T} THEN p ELSE CAST(0.0 AS DOUBLE) END
                AS fp_t,
              CASE WHEN s >= {_LSH_T} THEN CAST(1.0 AS DOUBLE) - p
                   ELSE CAST(0.0 AS DOUBLE) END AS fn_t
       FROM pp),
agg AS (
  SELECT bands, rows,
         CAST(bands * rows AS BIGINT) AS n_hashes,
         round(CAST(sum(CAST(fp_t AS DECIMAL(30,10))) AS DOUBLE)
               * CAST({_LSH_STEP} AS DOUBLE), 6) AS fp_area,
         round(CAST(sum(CAST(fn_t AS DECIMAL(30,10))) AS DOUBLE)
               * CAST({_LSH_STEP} AS DOUBLE), 6) AS fn_area
  FROM sc GROUP BY 1, 2),
fin AS (SELECT *, round(fp_area + fn_area, 6) AS cost FROM agg)
SELECT CAST(bands AS BIGINT) AS bands, CAST(rows AS BIGINT) AS rows,
       n_hashes, fp_area, fn_area, cost,
       row_number() OVER (ORDER BY cost ASC, n_hashes ASC, bands DESC) = 1
         AS is_best
FROM fin
""",
)
