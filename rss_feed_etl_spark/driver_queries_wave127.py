"""Driver-contract queries, wave 127: Benjamini-Hochberg FDR selection
and Simple Good-Turing unseen-mass estimation.

Reference anchor: the reference eyeballs per-feed summary counts
(src/etl/rss_feed_etl.py); BH is what keeps a 300-segment metric sweep
from fabricating wins, and Good-Turing prices how much vocabulary the
NEXT crawl shard will add — the planning twin of vocab_coverage_curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .functions.hashing import md5_bucket
from .operators import profiling, textstats

# --- BH selection over a planted test battery --------------------------------------
# 200 tests with md5-uniform null p-values; every 20th is a planted
# signal (p divided by 1e4).  BH at alpha=0.1 must pick up the signals
# and almost none of the nulls.

_BH_ALPHA = 0.1
_BH_M = 200


def _q_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = spark.range(_BH_M).select(F.col("id").cast("long").alias("test_id"))
    u = (
        md5_bucket(F.concat(F.lit("bh-v1:"), F.col("test_id").cast("string")))
        % 1000000
    ).cast("double") / 1000000.0
    p = F.when(F.col("test_id") % 20 == 0, u / 10000.0).otherwise(u)
    tests = ids.select("test_id", p.alias("p"))
    return profiling.bh_fdr_select(tests, alpha=_BH_ALPHA)


_BH_HK = _hexfold("('bh-v1:' || CAST(test_id AS VARCHAR))")

_register(
    "bh_fdr_select",
    _q_bh,
    f"""
WITH ids AS (SELECT CAST(unnest(range({_BH_M})) AS BIGINT) AS test_id),
tests AS (
  SELECT test_id,
         CASE WHEN test_id % 20 = 0
              THEN (({_BH_HK} % 1000000) / CAST(1000000.0 AS DOUBLE)) / 10000.0
              ELSE ({_BH_HK} % 1000000) / CAST(1000000.0 AS DOUBLE)
         END AS p
  FROM ids),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM tests),
ranked AS (SELECT test_id, p,
                  row_number() OVER (ORDER BY p ASC, test_id ASC) AS rank
           FROM tests),
kstar AS (SELECT CAST(coalesce(max(rank), 0) AS BIGINT) AS k
          FROM ranked, m WHERE p <= rank * {_BH_ALPHA} / m)
SELECT test_id, round(p, 6) AS p, CAST(rank AS BIGINT) AS rank,
       m.m AS n_tests, kstar.k AS k_selected
FROM ranked, m, kstar WHERE rank <= kstar.k
""",
)


# --- Good-Turing unseen mass --------------------------------------------------------


def _q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.good_turing_mass(docs, max_r=5, ngram=3)


_register(
    "good_turing_mass",
    _q_good_turing,
    r"""
WITH t AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
           FROM documents),
toks AS (
  SELECT unnest(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
  FROM t),
types AS (SELECT tok, count(*) AS r FROM toks GROUP BY 1),
coc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM types GROUP BY 1),
tot AS (SELECT CAST(sum(r) AS DOUBLE) AS n_tokens FROM types),
n1 AS (SELECT n_r AS n1 FROM coc WHERE r = 1),
nxt AS (SELECT r - 1 AS r, n_r AS n_r_plus1 FROM coc)
SELECT CAST(coc.r AS BIGINT) AS r, coc.n_r,
       CAST(coalesce(nxt.n_r_plus1, 0) AS BIGINT) AS n_r_plus1,
       round((coc.r + 1) * CAST(coalesce(nxt.n_r_plus1, 0) AS DOUBLE)
             / coc.n_r, 6) AS r_star,
       round(CAST(n1 AS DOUBLE) / n_tokens, 6) AS unseen_mass
FROM coc LEFT JOIN nxt USING (r), tot, n1
WHERE coc.r <= 5
""",
)
