"""Driver-contract queries, wave 115: right-to-erasure impact audit and
per-cluster simplified silhouette.

Reference anchor: the reference's merge framework deletes by anti-join
(src/rss_feed_etl/core/merge.py removed-set); the erasure audit is the
compliance-grade preflight of the same cascade, and the silhouette is
the quality gate for every centroid consumer already in the registry
(kmeans_clusters, IVF quantizers, diversity samplers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import clustering, profiling

# --- right-to-erasure blast radius ------------------------------------------------

_ERASE_MOD = 97


def _q_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.erasure_impact_audit(
        td.load_table(spark, sf_dir, "customer"),
        td.load_table(spark, sf_dir, "orders"),
        td.load_table(spark, sf_dir, "lineitem"),
        td.load_table(spark, sf_dir, "nation"),
        key_mod=_ERASE_MOD,
    )


_register(
    "erasure_impact_audit",
    _q_erasure,
    f"""
WITH erased AS (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % {_ERASE_MOD} = 0),
cg AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
       FROM erased JOIN nation ON c_nationkey = n_nationkey GROUP BY 1),
ok AS (SELECT o_orderkey, c_nationkey
       FROM orders JOIN erased ON o_custkey = c_custkey),
og AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders
       FROM ok JOIN nation ON c_nationkey = n_nationkey GROUP BY 1),
lg AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_lineitems,
              round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
                                  AS DECIMAL(30,10))) AS DOUBLE), 2)
                AS revenue_removed
       FROM lineitem JOIN ok ON l_orderkey = o_orderkey
       JOIN nation ON c_nationkey = n_nationkey GROUP BY 1)
SELECT cg.n_name, n_customers,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(n_lineitems, 0) AS BIGINT) AS n_lineitems,
       coalesce(revenue_removed, 0.0) AS revenue_removed
FROM cg LEFT JOIN og USING (n_name) LEFT JOIN lg USING (n_name)
""",
)


# --- simplified silhouette over the wave's Lloyd clustering -----------------------


def _q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return clustering.silhouette_by_cluster(emb, k=8, iters=1)


_DIST = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> (e.vec[i] - c.cvec[i]) * (e.vec[i] - c.cvec[i])), (x, y) -> x + y)"
)

_register(
    "silhouette_by_cluster",
    _q_silhouette,
    f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
c0 AS (
  SELECT vec_id AS cid, list_transform(vec, x -> round(x, 6)) AS cvec
  FROM emb WHERE vec_id < 8),
s1 AS (SELECT e.vec_id, e.vec, c.cid, {_DIST} AS dist
       FROM emb e CROSS JOIN c0 c),
a1 AS (SELECT vec_id, vec, cid FROM (
         SELECT *, row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist ASC, cid ASC) AS rn
         FROM s1) WHERE rn = 1),
u1 AS (SELECT cid, i AS pos, round(avg(vec[i]), 6) AS cv
       FROM a1 CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
       GROUP BY cid, i),
c1 AS (SELECT cid, list(cv ORDER BY pos) AS cvec FROM u1 GROUP BY cid),
s2 AS (SELECT e.vec_id, c.cid, {_DIST} AS dist
       FROM emb e CROSS JOIN c1 c),
r AS (SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist ASC, cid ASC) AS rn
      FROM s2),
p AS (SELECT r1.vec_id, r1.cid AS cluster_id,
             sqrt(r1.dist) AS a_raw, sqrt(r2.dist) AS b_raw
      FROM r r1 JOIN r r2 ON r1.vec_id = r2.vec_id
      WHERE r1.rn = 1 AND r2.rn = 2),
q AS (SELECT cluster_id,
             round(a_raw, 9) AS a,
             round(CASE WHEN greatest(a_raw, b_raw) > 0
                        THEN (b_raw - a_raw) / greatest(a_raw, b_raw)
                        ELSE 0.0 END, 9) AS s
      FROM p)
SELECT cluster_id,
       CAST(count(*) AS BIGINT) AS n_points,
       round(CAST(sum(CAST(a AS DECIMAL(30,10))) AS DOUBLE) / count(*), 6)
         AS mean_a,
       round(CAST(sum(CAST(s AS DECIMAL(30,10))) AS DOUBLE) / count(*), 6)
         AS mean_silhouette
FROM q GROUP BY 1
""",
)
