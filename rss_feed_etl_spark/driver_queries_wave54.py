"""Driver-contract queries, wave 54: duplicate-cluster size profile — the
dedup-impact report built by composing the near-dup component pipeline
with a size rollup (how much of the corpus sits in clusters of 2, 3, …,
and how many docs dedup would drop at each cluster size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _aug_docs
from .operators import dedup

# --- duplicate-cluster size histogram ----------------------------------------


def _q_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup.minhash_lsh_pairs(
        _aug_docs(spark, sf_dir), id_col="id", text_col="text", n=3, threshold=0.25
    )
    comp = dedup.neardup_components(pairs)
    sizes = comp.groupBy("component_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        (F.count("*") * F.col("cluster_size")).cast("bigint").alias("n_docs"),
        (F.count("*") * (F.col("cluster_size") - 1)).cast("bigint").alias(
            "n_droppable"
        ),
    )


# composition oracle: the components CTE (itself built on the minhash-LSH
# pair SQL) + a two-level size rollup
_register(
    "dup_cluster_sizes",
    _q_cluster_sizes,
    f"""
WITH RECURSIVE comp AS ({ORACLES["neardup_components"]}),
sizes AS (SELECT component_id, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY 1)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * cluster_size AS BIGINT) AS n_docs,
       CAST(count(*) * (cluster_size - 1) AS BIGINT) AS n_droppable
FROM sizes GROUP BY 1
""",
)
