"""Wave-61 driver queries: margin-based bitext mining (Artetxe & Schwenk
2019 — the CCMatrix/LASER parallel-pair miner) and a k-anonymity privacy
audit over event data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _band_sig_sql, _cos_sql
from .operators import profiling, similarity

_BT_A, _BT_B, _BT_K, _BT_THR = 0, 1, 4, 1.05
_BT_BANDS = 6


def _q_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 6: this name now runs the LSH-banded candidate plan (VERDICT
    # r5 #2 retired the exact A-cross-B sweep from the registry surface;
    # the brute sibling survives as the unregistered recall baseline).
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.bitext_mining_pairs(
        emb, label_a=_BT_A, label_b=_BT_B, k=_BT_K,
        margin_threshold=_BT_THR, bands=_BT_BANDS,
    )


_BT_ABANDS = "\nUNION ALL\n".join(
    f"SELECT a_id, {b} AS band, {_band_sig_sql(b)} AS sig FROM a"
    for b in range(_BT_BANDS)
)
_BT_BBANDS = "\nUNION ALL\n".join(
    f"SELECT b_id, {b} AS band, {_band_sig_sql(b)} AS sig FROM b"
    for b in range(_BT_BANDS)
)

# The banded miner's oracle, shared verbatim with the explicitly-named
# scale alias registered in wave 100 (both names run the same plan now).
_BT_BANDED_SQL = f"""
WITH a AS (SELECT vec_id AS a_id, embedding FROM embeddings WHERE label = {_BT_A}),
b AS (SELECT vec_id AS b_id, embedding FROM embeddings WHERE label = {_BT_B}),
abands AS ({_BT_ABANDS}),
bbands AS ({_BT_BBANDS}),
cand AS (
  SELECT DISTINCT x.a_id, y.b_id
  FROM abands x JOIN bbands y ON x.band = y.band AND x.sig = y.sig),
s AS (
  SELECT c.a_id, c.b_id, {_cos_sql("av.embedding", "bv.embedding")} AS cos
  FROM cand c JOIN a av USING (a_id) JOIN b bv USING (b_id)),
r AS (SELECT *,
        row_number() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS ra,
        row_number() OVER (PARTITION BY b_id ORDER BY cos DESC, a_id) AS rb
      FROM s),
na AS (SELECT a_id, CAST(sum(CAST(cos AS DECIMAL(10,6))) AS DOUBLE) / count(*) AS ma
       FROM r WHERE ra <= {_BT_K} GROUP BY 1),
nb AS (SELECT b_id, CAST(sum(CAST(cos AS DECIMAL(10,6))) AS DOUBLE) / count(*) AS mb
       FROM r WHERE rb <= {_BT_K} GROUP BY 1),
m AS (SELECT s.a_id, s.b_id, round(s.cos / ((ma + mb) / 2.0), 6) AS margin
      FROM s JOIN na ON s.a_id = na.a_id JOIN nb ON s.b_id = nb.b_id),
best AS (SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY margin DESC, b_id) AS rk
         FROM m)
SELECT a_id, b_id, margin FROM best WHERE rk = 1 AND margin > {_BT_THR}
"""

_register("bitext_mining_pairs", _q_bitext, _BT_BANDED_SQL)


_KA_K = 5


def _q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("hour_of_day"),
        F.floor(F.col("value") / 50).cast("bigint").alias("value_band"),
    )
    return profiling.k_anonymity_violations(
        ev, ["event_type", "hour_of_day", "value_band"], k=_KA_K
    )


_register(
    "k_anonymity_violations",
    _q_k_anonymity,
    f"""
SELECT event_type,
       CAST(hour(ts) AS INT) AS hour_of_day,
       CAST(floor(value / 50) AS BIGINT) AS value_band,
       CAST(count(*) AS BIGINT) AS group_size
FROM events
GROUP BY 1, 2, 3
HAVING count(*) < {_KA_K}
""",
)
