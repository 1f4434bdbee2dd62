"""Driver-contract queries, wave 121: perceptual-hash media near-dup
pairs and their transitive components.

Reference anchor: the reference dedups text rows by exact link key
(src/rss_feed_etl/core/merge.py); ``media_exact_dedup`` (wave 108) is
the byte-level media twin, and this wave adds the NEAR-duplicate layer —
re-encoded/slightly-edited copies that differ in bytes but sit within a
few perceptual-hash bits.  The planted variants flip 1 bit (caught) and
5 bits (correctly excluded at max_hamming=3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .driver_queries_wave3 import _media_df
from .operators import dedup, multimodal

_PH_BITS = 60
_PH_MAXH = 3


def _phash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_df(spark, sf_dir, "image")
    base = multimodal.image_phash(media)
    near = base.select(
        (F.col("media_id") + 1000000).alias("media_id"),
        F.col("phash")
        .bitwiseXOR(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(media_id % 60 AS INT))")
        )
        .alias("phash"),
    )
    far = base.filter(F.col("media_id") % 7 == 0).select(
        (F.col("media_id") + 2000000).alias("media_id"),
        F.col("phash")
        .bitwiseXOR(
            F.expr("shiftleft(CAST(31 AS BIGINT), CAST(media_id % 50 AS INT))")
        )
        .alias("phash"),
    )
    return base.unionByName(near).unionByName(far)


def _q_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.phash_hamming_neardup(
        _phash_frame(spark, sf_dir), bits=_PH_BITS, max_hamming=_PH_MAXH
    )


_PH_BAND_BITS = _PH_BITS // (_PH_MAXH + 1)
_PH_MASK = (1 << _PH_BAND_BITS) - 1

_PH_PAIRS_SQL = f"""
base AS (SELECT doc_id AS id, {_hexfold("text")} AS ph FROM documents),
aug AS (
  SELECT id, ph FROM base
  UNION ALL
  SELECT id + 1000000,
         xor(ph, (CAST(1 AS BIGINT) << CAST(id % 60 AS INT)))
  FROM base
  UNION ALL
  SELECT id + 2000000,
         xor(ph, (CAST(31 AS BIGINT) << CAST(id % 50 AS INT)))
  FROM base WHERE id % 7 = 0),
bands AS ({" UNION ALL ".join(
    f"SELECT id, ph, {b} AS band, (ph >> {b * _PH_BAND_BITS}) & {_PH_MASK} AS val FROM aug"
    for b in range(_PH_MAXH + 1))}),
bok AS (SELECT band, val FROM bands GROUP BY 1, 2
        HAVING count(*) BETWEEN 2 AND 10000),
bk AS (SELECT bands.* FROM bands JOIN bok USING (band, val)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.ph AS pha, b.ph AS phb
  FROM bk a JOIN bk b ON a.band = b.band AND a.val = b.val AND a.id < b.id),
ph_pairs AS (
  SELECT id_a, id_b, CAST(bit_count(xor(pha, phb)) AS BIGINT) AS hamming
  FROM cand WHERE bit_count(xor(pha, phb)) <= {_PH_MAXH})
"""

_register(
    "image_phash_neardup",
    _q_phash_pairs,
    f"""
WITH {_PH_PAIRS_SQL}
SELECT id_a, id_b, hamming FROM ph_pairs
""",
)


def _q_phash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = multimodal.phash_hamming_neardup(
        _phash_frame(spark, sf_dir), bits=_PH_BITS, max_hamming=_PH_MAXH
    )
    return dedup.neardup_components(pairs)


_register(
    "phash_neardup_components",
    _q_phash_components,
    f"""
WITH RECURSIVE {_PH_PAIRS_SQL},
edges AS (
  SELECT id_a AS a, id_b AS b FROM ph_pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM ph_pairs),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(src, dst) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
SELECT src AS id, min(dst) AS component_id
FROM reach GROUP BY src
""",
)
