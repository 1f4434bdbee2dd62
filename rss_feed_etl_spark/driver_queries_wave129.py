"""Driver-contract queries, wave 129: HITS authorities and degree
assortativity over the user→item interaction graph.

Reference anchor: the reference ranks nothing structurally (feeds are
flat lists — src/rss_feed_etl/core/config.py); HITS is the second
classic importance signal next to the registry's PageRank (wave 26),
and assortativity is the one-number skew forecast for every graph
operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import graph

# --- shared bipartite edge list: clicking users → items (props.k) ------------------

_HITS_ITERS = 2
_HITS_TOP = 20


def _click_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("src"),
        F.get_json_object("props", "$.k").cast("long").alias("dst"),
    ).filter(F.col("dst").isNotNull())

_EDGES_SQL = """
e AS (SELECT DISTINCT user_id AS src,
             CAST(json_extract(props, '$.k') AS BIGINT) AS dst
      FROM events
      WHERE event_type = 'click'
        AND json_extract(props, '$.k') IS NOT NULL)
"""


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = graph.hits_bipartite(
        _click_edges(spark, sf_dir), iters=_HITS_ITERS
    )
    return out.orderBy(
        F.col("authority").desc(), F.col("node").asc()
    ).limit(_HITS_TOP)


def _hits_sql() -> str:
    steps = []
    prev_h = "h0"
    for i in range(1, _HITS_ITERS + 1):
        steps.append(
            f"""ra{i} AS (SELECT dst, CAST(sum(CAST(round(h, 9) AS DECIMAL(30,10)))
                    AS DOUBLE) AS ra
        FROM e JOIN {prev_h} USING (src) GROUP BY 1),
a{i} AS (SELECT dst, round(ra / (SELECT CAST(sum(CAST(round(ra, 9)
                AS DECIMAL(30,10))) AS DOUBLE) FROM ra{i}), 9) AS a
       FROM ra{i}),
rh{i} AS (SELECT src, CAST(sum(CAST(round(a, 9) AS DECIMAL(30,10)))
                    AS DOUBLE) AS rh
        FROM e JOIN a{i} USING (dst) GROUP BY 1),
h{i} AS (SELECT src, round(rh / (SELECT CAST(sum(CAST(round(rh, 9)
                AS DECIMAL(30,10))) AS DOUBLE) FROM rh{i}), 9) AS h
       FROM rh{i})"""
        )
        prev_h = f"h{i}"
    return f"""
WITH {_EDGES_SQL},
h0 AS (SELECT DISTINCT src, CAST(1.0 AS DOUBLE) AS h FROM e),
{", ".join(steps)}
SELECT dst AS node, round(a, 6) AS authority
FROM a{_HITS_ITERS}
ORDER BY authority DESC, node ASC LIMIT {_HITS_TOP}
"""


_register("hits_authorities", _q_hits, _hits_sql())


# --- degree assortativity -----------------------------------------------------------


def _q_assort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.degree_assortativity(_click_edges(spark, sf_dir))


_register(
    "degree_assortativity",
    _q_assort,
    f"""
WITH {_EDGES_SQL},
dout AS (SELECT src, CAST(count(*) AS BIGINT) AS dx FROM e GROUP BY 1),
din AS (SELECT dst, CAST(count(*) AS BIGINT) AS dy FROM e GROUP BY 1),
j AS (SELECT dx, dy FROM e JOIN dout USING (src) JOIN din USING (dst)),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(dx AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(dy AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(dx * dy AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(dx * dx AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(dy * dy AS DECIMAL(38,6))) AS DOUBLE) AS syy
  FROM j)
SELECT n AS n_edges,
       CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0
            THEN round((n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS assortativity
FROM agg
""",
)
