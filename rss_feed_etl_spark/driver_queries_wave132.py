"""Driver-contract queries, wave 132: Bradley-Terry strength ranking
from pairwise comparisons.

Reference anchor: the reference's LLM scorer emits absolute scores
(src/rss_feed_etl/llm/scorer.py); modern LLM evaluation prefers
pairwise judgments, and Bradley-Terry is the estimator that turns those
into a strength scale that credits opponent quality (the arena
leaderboard math), here over item-vs-item comparisons mined from each
user's event sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics

_BT_ITERS = 2
_BT_TOP = 20


def _q_bt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag(item).over(w).alias("pa"),
        F.lag("value").over(w).alias("pv"),
        item.alias("cb"),
        F.col("value").alias("cv"),
    ).filter(
        F.col("pa").isNotNull()
        & F.col("cb").isNotNull()
        & (F.col("pa") != F.col("cb"))
    )
    comp = seq.select(
        F.when(F.col("pv") > F.col("cv"), F.col("pa"))
        .otherwise(F.col("cb")).alias("winner"),
        F.when(F.col("pv") > F.col("cv"), F.col("cb"))
        .otherwise(F.col("pa")).alias("loser"),
    )
    return eventanalytics.bradley_terry_ranks(
        comp, iters=_BT_ITERS, top=_BT_TOP
    )


def _bt_sql() -> str:
    steps = []
    prev = "w0"
    for t in range(1, _BT_ITERS + 1):
        steps.append(
            f"""m{t} AS (
  SELECT pairs.i, pairs.j, pairs.n,
         CAST(round(pairs.n / (wi.wt + wj.wt), 9) AS DECIMAL(38,10)) AS d
  FROM pairs JOIN {prev} wi ON pairs.i = wi.item
             JOIN {prev} wj ON pairs.j = wj.item),
ds{t} AS (SELECT item, CAST(sum(d) AS DOUBLE) AS dsum FROM (
            SELECT i AS item, d FROM m{t}
            UNION ALL SELECT j, d FROM m{t}) GROUP BY 1),
rw{t} AS (SELECT items.item,
                 CASE WHEN dsum > 0 THEN n_wins / dsum
                      ELSE CAST(0.0 AS DOUBLE) END AS rw
          FROM items JOIN ds{t} USING (item)),
tt{t} AS (SELECT CAST(sum(CAST(round(rw, 9) AS DECIMAL(38,10))) AS DOUBLE)
                   AS s FROM rw{t}),
w{t} AS (SELECT item, round(rw * k / s, 9) AS wt FROM rw{t}, tt{t}, kk)"""
        )
        prev = f"w{t}"
    return f"""
WITH seq AS (
  SELECT lag(CAST(json_extract(props, '$.k') AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pa,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
         CAST(json_extract(props, '$.k') AS BIGINT) AS cb,
         value AS cv
  FROM events),
comp AS (SELECT CASE WHEN pv > cv THEN pa ELSE cb END AS w,
                CASE WHEN pv > cv THEN cb ELSE pa END AS l
         FROM seq WHERE pa IS NOT NULL AND cb IS NOT NULL AND pa <> cb),
pairs AS (SELECT least(w, l) AS i, greatest(w, l) AS j,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN w = least(w, l) THEN 1 ELSE 0 END)
                      AS BIGINT) AS wins_i
          FROM comp GROUP BY 1, 2),
items AS (SELECT item, CAST(sum(win) AS BIGINT) AS n_wins FROM (
            SELECT i AS item, wins_i AS win FROM pairs
            UNION ALL SELECT j, n - wins_i FROM pairs) GROUP BY 1),
kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM items),
w0 AS (SELECT item, CAST(1.0 AS DOUBLE) AS wt FROM items),
{", ".join(steps)},
nm AS (SELECT item, CAST(sum(n) AS BIGINT) AS n_matches FROM (
         SELECT i AS item, n FROM pairs
         UNION ALL SELECT j, n FROM pairs) GROUP BY 1)
SELECT items.item, n_wins, n_matches, round(wt, 6) AS strength
FROM items JOIN {prev} USING (item) JOIN nm USING (item)
ORDER BY strength DESC, item ASC LIMIT {_BT_TOP}
"""


_register("bradley_terry_ranks", _q_bt, _bt_sql())
