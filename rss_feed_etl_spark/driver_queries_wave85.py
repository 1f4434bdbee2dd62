"""Wave-85 driver queries: k-core membership of the item co-engagement
graph (fixed-iteration peeling, oracle = unrolled CTE layers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import graph

_K = 10
_ITERS = 8
_MAX_ITEMS = 50  # hot-(user, day) guard: bounds pair fan-out
_THR_Q = 0.9  # keep only top-decile co-engagement edges


def _item_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item co-engagement graph: items the same user touched the same
    DAY, kept only when the pair's support reaches the top quartile of
    all pair weights — a scale-adaptive sparsifier (a fixed support
    threshold saturates to a complete graph as users grow)."""
    ev = td.load_table(spark, sf_dir, "events")
    ui = (
        ev.select(
            F.col("user_id").alias("u"),
            F.date_trunc("day", "ts").alias("dy"),
            F.get_json_object("props", "$.k").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    cnt = ui.groupBy("u", "dy").agg(F.count("*").alias("c"))
    ui = ui.join(
        F.broadcast(
            cnt.filter(F.col("c") <= _MAX_ITEMS).select("u", "dy")
        ),
        ["u", "dy"],
    )
    a = ui.select("u", "dy", F.col("item").alias("a"))
    b = ui.select("u", "dy", F.col("item").alias("b"))
    pairs = (
        a.join(b, ["u", "dy"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("w"))
    )
    thr = pairs.agg(F.percentile("w", F.lit(_THR_Q)).alias("thr"))
    return (
        pairs.crossJoin(F.broadcast(thr))
        .filter(F.col("w") >= F.col("thr"))
        .select("a", "b")
    )


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.kcore_membership(
        _item_edges(spark, sf_dir), k=_K, max_iter=_ITERS
    )


def _kcore_sql() -> str:
    layers = []
    prev = "e0"
    for i in range(1, _ITERS + 1):
        layers.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) c FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) t
  GROUP BY 1),
k{i} AS (SELECT node FROM d{i} WHERE c >= {_K}),
e{i} AS MATERIALIZED (
  SELECT a, b FROM {prev}
  WHERE a IN (SELECT node FROM k{i}) AND b IN (SELECT node FROM k{i}))"""
        )
        prev = f"e{i}"
    return f"""
WITH ui AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS dy,
         json_extract_string(props, '$.k') AS item
  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
ok AS (SELECT u, dy FROM ui GROUP BY 1, 2 HAVING count(*) <= {_MAX_ITEMS}),
uif AS (SELECT ui.u, ui.dy, ui.item
        FROM ui JOIN ok ON ui.u = ok.u AND ui.dy = ok.dy),
p AS MATERIALIZED (
  SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS w
  FROM uif x JOIN uif y ON x.u = y.u AND x.dy = y.dy AND x.item < y.item
  GROUP BY 1, 2),
thr AS (SELECT quantile_cont(w, {_THR_Q}) AS thr FROM p),
e0 AS MATERIALIZED (
  SELECT a, b FROM p, thr WHERE w >= thr.thr),
{", ".join(layers)}
SELECT node, CAST(c AS BIGINT) AS degree FROM (
  SELECT node, count(*) AS c FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) t
  GROUP BY 1) WHERE c >= {_K}
"""


_register("kcore_membership", _q_kcore, _kcore_sql())
