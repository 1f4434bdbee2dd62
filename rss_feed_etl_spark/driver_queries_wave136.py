"""Driver-contract queries, wave 136: the per-day CUSUM trajectory over
a planted regime change, and the k-NN hubness histogram.

Reference anchor: the reference's daily runs silently absorb feed-volume
regime changes (src/etl/rss_feed_etl.py scheduling); wave 66's
``cusum_changepoints`` reports the per-series alarm SUMMARY — this wave
emits the day-by-day detector path around a PLANTED shift (the view
that shows detection latency), and hubness is the embedding-space
pathology audit for every retrieval/dedup consumer of the ANN family.

CUSUM plant: event volume DOUBLES from 2024-01-21 (a union of the tail
with itself, applied identically on both engines) so the trajectory has
a real changepoint to trace in the 30-day window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql
from .operators import similarity, timeseries

_CUSUM_SHIFT_TS = "2024-01-21 00:00:00"
_CUSUM_K = 0.5
_CUSUM_H = 4.0


def _q_cusum_traj(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events").select("ts", "event_type")
    staged = ev.unionByName(
        ev.filter(F.col("ts") >= F.to_timestamp(F.lit(_CUSUM_SHIFT_TS)))
    )
    return timeseries.cusum_trajectory(
        staged, drift_k=_CUSUM_K, alarm_h=_CUSUM_H
    )


_register(
    "cusum_shift_trajectory",
    _q_cusum_traj,
    f"""
WITH staged AS (
  SELECT ts, event_type FROM events
  UNION ALL
  SELECT ts, event_type FROM events
  WHERE ts >= TIMESTAMP '{_CUSUM_SHIFT_TS}'),
d AS (SELECT event_type AS t, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM staged GROUP BY 1, 2),
st AS (SELECT t, CAST(sum(n) AS BIGINT) AS s,
              CAST(sum(n * n) AS BIGINT) AS sq,
              CAST(count(*) AS BIGINT) AS c
       FROM d GROUP BY 1),
z AS (SELECT d.t, d.day, d.n,
             (CAST(d.n AS DOUBLE) - CAST(st.s AS DOUBLE) / st.c)
               / sqrt(greatest(CAST(st.sq AS DOUBLE) / st.c
                               - (CAST(st.s AS DOUBLE) / st.c)
                                 * (CAST(st.s AS DOUBLE) / st.c), 0.0)) AS zv,
             sqrt(greatest(CAST(st.sq AS DOUBLE) / st.c
                           - (CAST(st.s AS DOUBLE) / st.c)
                             * (CAST(st.s AS DOUBLE) / st.c), 0.0)) AS sd
      FROM d JOIN st ON d.t = st.t),
r AS (SELECT t, day, n, zv,
             sum(zv - {_CUSUM_K}) OVER (PARTITION BY t ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rp,
             sum(-zv - {_CUSUM_K}) OVER (PARTITION BY t ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn
      FROM z WHERE sd > 0),
s AS (SELECT t, day, n, zv,
             rp - least(min(rp) OVER (PARTITION BY t ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS sp,
             rn - least(min(rn) OVER (PARTITION BY t ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS sn
      FROM r)
SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day, n,
       round(zv, 6) AS z,
       round(sp, 6) AS cusum_pos, round(sn, 6) AS cusum_neg,
       (sp > {_CUSUM_H} OR sn > {_CUSUM_H}) AS alarm
FROM s
""",
)


_HUB_NQ = 100
_HUB_K = 5


def _q_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.knn_hub_degree_hist(emb, n_queries=_HUB_NQ, k=_HUB_K)


_register(
    "knn_hub_degree_hist",
    _q_hubness,
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < {_HUB_NQ}),
scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                  {_cos_sql("q.qv", "e.embedding")} AS cs
           FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cs DESC, neighbor_id ASC) AS rank
           FROM scored),
indeg AS (SELECT neighbor_id, CAST(count(*) AS BIGINT) AS in_degree
          FROM ranked WHERE rank <= {_HUB_K} GROUP BY 1),
hist AS (SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors
         FROM indeg GROUP BY 1),
z AS (SELECT CAST(0 AS BIGINT) AS in_degree,
             CAST((SELECT count(*) FROM embeddings)
                  - (SELECT count(*) FROM indeg) AS BIGINT) AS n_vectors)
SELECT in_degree, n_vectors FROM hist
UNION ALL
SELECT in_degree, n_vectors FROM z WHERE n_vectors > 0
""",
)
