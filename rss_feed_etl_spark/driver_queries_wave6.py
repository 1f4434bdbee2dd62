"""Driver-contract queries, wave 6: transitive near-dup clustering,
sliding event-time windows, pivot aggregation, and period-over-period
window analytics.

``neardup_components`` is the capstone of the corpus dedup suite: the
MinHash pair graph's connected components, computed iteratively on Spark
and replayed in the DuckDB oracle as a recursive CTE — a genuinely
iterative algorithm, still exactly oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _aug_docs
from .operators import dedup

# --- transitive near-dup clustering (connected components) ----------------


def _q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup.minhash_lsh_pairs(
        _aug_docs(spark, sf_dir), id_col="id", text_col="text", n=3, threshold=0.25
    )
    return dedup.neardup_components(pairs)


# oracle: undirected reachability as a recursive CTE, component id = min
# reachable node — exactly the fixpoint the Spark loop converges to
_register(
    "neardup_components",
    _q_components,
    f"""
WITH RECURSIVE pairs AS ({ORACLES["minhash_lsh_neardup"]}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(src, dst) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
SELECT src AS id, min(dst) AS component_id
FROM reach GROUP BY src
""",
)


# --- sliding event-time windows -------------------------------------------

_SLIDE_MIN = 30
_WIN_MIN = 60


def _q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (duration 1h, slide 30min) — each event lands in
    exactly two windows.  ``F.window`` is the same construct Structured
    Streaming uses for watermarked sliding aggregation; in batch it
    compiles to an explode over the window set + one hash aggregate
    (shuffle key = window start), no self-union."""
    ev = td.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", f"{_WIN_MIN} minutes", f"{_SLIDE_MIN} minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_events",
            "total_value",
        )
    )


# each event belongs to the windows starting at floor_30min(ts) and
# floor_30min(ts) - 30min; DuckDB's time_bucket shares Spark's epoch-aligned
# grid for sub-day intervals
_register(
    "sliding_event_windows",
    _q_sliding_windows,
    f"""
WITH w AS (
  SELECT time_bucket(INTERVAL '{_SLIDE_MIN} minutes', ts)
           - k * INTERVAL '{_SLIDE_MIN} minutes' AS win_start,
         value
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
SELECT win_start,
       win_start + INTERVAL '{_WIN_MIN} minutes' AS win_end,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM w GROUP BY win_start
""",
)


# --- pivot aggregation -----------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type matrix via ``pivot``.  The pivot values are
    declared explicitly: Spark then skips the distinct-values pre-query
    and plans a single hash aggregate keyed on user_id with one
    conditional-count expression per column — same exchange count as a
    plain groupBy."""
    ev = td.load_table(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


_register(
    "event_type_pivot",
    _q_event_pivot,
    f"""
SELECT user_id,
       {", ".join(f"count(*) FILTER (event_type = '{t}') AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
""",
)


# --- period-over-period revenue (lag window) ------------------------------


def _q_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily gross revenue with 1-day and 7-day lag deltas.  The aggregate
    shuffles on ship-day (partial aggregation map-side first); the lag
    window then runs over the tiny day-grain result — an unpartitioned
    window is fine exactly because the input is one row per day, never
    the fact table."""
    li = td.load_table(spark, sf_dir, "lineitem")
    # sum in DECIMAL: cents are exact and addition is order-independent, so
    # 2499 day-groups hash-match the oracle bit-for-bit (a double sum lands
    # on the wrong side of a cent boundary for a handful of days)
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("ship_day")).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue")
    )
    w = Window.orderBy("ship_day")
    return daily.select(
        "ship_day",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue", 1).over(w), 2).alias("dod_delta"),
        F.round(F.col("revenue") - F.lag("revenue", 7).over(w), 2).alias("wow_delta"),
    )


_register(
    "daily_revenue_wow",
    _q_revenue_wow,
    """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS ship_day,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
              AS DOUBLE) AS revenue
  FROM lineitem GROUP BY 1)
SELECT ship_day, revenue,
       round(revenue - lag(revenue, 1) OVER (ORDER BY ship_day), 2) AS dod_delta,
       round(revenue - lag(revenue, 7) OVER (ORDER BY ship_day), 2) AS wow_delta
FROM daily
""",
)
