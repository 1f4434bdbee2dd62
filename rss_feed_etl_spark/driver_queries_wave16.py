"""Wave-16 driver queries: SimHash banded near-dup pairs and canonical-URL
dedup — the remaining dedup modalities a feed/training-data pipeline needs
next to exact / minhash / jaccard / embedding near-dup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .functions.urls import url_dedup
from .operators import dedup

# --- SimHash near-dup (banded Hamming ≤ 3) --------------------------------

# light perturbation: one appended token flips at most the low-margin vote
# bits, so true near-dups sit within a small Hamming distance
_AUG_SIM_SQL = """
aug AS (
  SELECT doc_id AS id, text FROM documents WHERE doc_id < 250
  UNION ALL
  SELECT doc_id + 1000000 AS id, text || ' zzz' AS text
  FROM documents WHERE doc_id < 250)
"""


def _aug_sim_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    pert = docs.select(
        (F.col("doc_id") + 1000000).alias("id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return docs.select(F.col("doc_id").alias("id"), "text").unionByName(pert)


def _q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_neardup_pairs(
        _aug_sim_docs(spark, sf_dir), id_col="id", text_col="text", max_hamming=3
    )


_SIMHASH_BITS_AUG = " + ".join(
    f"(CASE WHEN 2 * len(list_filter(codes, c -> (c >> {b}) & 1 = 1)) > len(codes) "
    f"THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
    for b in range(32)
)

_SIM_BANDS_SQL = "\nUNION ALL\n".join(
    f"SELECT id, simhash, {b} AS band, (simhash >> {b * 8}) & 255 AS val FROM fp"
    for b in range(4)
)

_register(
    "simhash_neardup",
    _q_simhash_neardup,
    f"""
WITH {_AUG_SIM_SQL},
codes AS (
  SELECT id,
         list_transform(string_split_regex(trim(lower(text)), '\\s+'), t -> {_code("t")}) AS codes
  FROM aug),
fp AS (SELECT id, {_SIMHASH_BITS_AUG} AS simhash FROM codes),
bands AS ({_SIM_BANDS_SQL}),
cand AS (
  SELECT DISTINCT x.id AS id_a, y.id AS id_b, x.simhash AS fa, y.simhash AS fb
  FROM bands x JOIN bands y ON x.band = y.band AND x.val = y.val AND x.id < y.id)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 3
""",
)


# --- canonical-URL dedup ---------------------------------------------------

# synthetic URL variants built deterministically from events: the same item
# appears with tracking params, a trailing slash, or a fragment, plus a
# case-variant scheme/host — canonicalization must collapse all of them
_URL_EXPR_SQL = """
'HTTPS://Example.COM/item/' || CAST(event_id % 500 AS VARCHAR) ||
CASE WHEN event_id % 3 = 0
     THEN '?utm_source=feed&utm_id=' || CAST(event_id % 7 AS VARCHAR)
     WHEN event_id % 3 = 1 THEN '/'
     ELSE '#section' END
"""


def _url_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("HTTPS://Example.COM/item/"),
        (F.col("event_id") % 500).cast("string"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(
                F.lit("?utm_source=feed&utm_id="), (F.col("event_id") % 7).cast("string")
            ),
        )
        .when(F.col("event_id") % 3 == 1, F.lit("/"))
        .otherwise(F.lit("#section")),
    )
    return ev.select("event_id", url.alias("link"))


def _q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return url_dedup(_url_variants(spark, sf_dir), url_col="link", id_col="event_id")


_register(
    "url_canonical_dedup",
    _q_url_dedup,
    f"""
WITH raw AS (SELECT event_id, {_URL_EXPR_SQL} AS link FROM events),
canon AS (
  SELECT event_id,
         s6 AS canonical_url
  FROM (
    SELECT event_id,
           lower(regexp_extract(s5, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*', 0)) ||
             substr(s5, length(regexp_extract(s5, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*', 0)) + 1)
             AS s6
    FROM (
      SELECT event_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(trim(link), '#.*$', '', 'g'),
                     '(utm_[a-z0-9_]+|fbclid|gclid)=[^&]*&', '', 'g'),
                   '[?&](utm_[a-z0-9_]+|fbclid|gclid)=[^&]*$', '', 'g'),
                 '[?&]$', '', 'g'),
               '/$', '', 'g') AS s5
      FROM raw)))
SELECT canonical_url,
       min(event_id) AS keeper_id,
       count(*) AS n_variants
FROM canon GROUP BY canonical_url
""",
)
