"""Sketch / approximate aggregates for 100 TB-scale profiling.

The reference has no aggregation tree at all (SURVEY.md §2.4 — whole-frame
counts only, `src/rss_feed_etl/core/data_loader.py:203-207`), but a
training-data pipeline lives on cardinality and distribution profiles:
distinct users per day, p99 of a quality score, heavy-hitter sources.

Exact forms (``count_distinct``, ``percentile``) are the oracle-checked
baselines.  The scale path is the sketch pair:

- ``approx_count_distinct`` — HyperLogLog++.  One shuffle of fixed-size
  sketch buffers instead of the two-phase expand+dedup shuffle of exact
  DISTINCT; error ~rsd regardless of cardinality.
- ``percentile_approx`` — Greenwald-Khanna quantile digest.  Bounded
  memory per group vs the exact form's full sorted collection, and the
  digests merge associatively so partial aggregation stays map-side.

Both sketches are mergeable, so at 1000 executors the combine tree moves
kilobytes per group, not the column itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCTS = [0.5, 0.9, 0.99]


def distinct_daily(
    events: DataFrame, ts_col: str = "ts", key_col: str = "user_id"
) -> DataFrame:
    """Exact distinct actors per day (the profile the sketches approximate).

    Spark plans exact DISTINCT-agg as a two-phase shuffle (expand on
    (day, user) then re-agg on day); correct but the expensive baseline.
    """
    return (
        events.groupBy(F.date_format(ts_col, "yyyy-MM-dd").alias("day"))
        .agg(
            F.count_distinct(key_col).alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day")
    )


def approx_distinct_daily(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    rsd: float = 0.02,
) -> DataFrame:
    """HLL++ variant of :func:`distinct_daily` — single-shuffle, fixed
    memory, the form that survives a 100 TB event log."""
    return (
        events.groupBy(F.date_format(ts_col, "yyyy-MM-dd").alias("day"))
        .agg(
            F.approx_count_distinct(key_col, rsd).alias("n_users_approx"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day")
    )


def value_percentiles(
    events: DataFrame, group_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Exact interpolated p50/p90/p99 per group (≡ SQL ``quantile_cont``)."""
    p = F.percentile(value_col, F.lit(PCTS))
    return (
        events.groupBy(group_col)
        .agg(
            F.round(p[0], 4).alias("p50"),
            F.round(p[1], 4).alias("p90"),
            F.round(p[2], 4).alias("p99"),
            F.round(F.avg(value_col), 4).alias("mean"),
        )
        .orderBy(group_col)
    )


def approx_value_percentiles(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    accuracy: int = 10000,
) -> DataFrame:
    """GK-digest variant of :func:`value_percentiles`: rank error ≤
    1/accuracy with O(accuracy) memory per group, mergeable partials."""
    p = F.percentile_approx(value_col, F.lit(PCTS), F.lit(accuracy))
    return (
        events.groupBy(group_col)
        .agg(
            F.round(p[0], 4).alias("p50"),
            F.round(p[1], 4).alias("p90"),
            F.round(p[2], 4).alias("p99"),
        )
        .orderBy(group_col)
    )


def heavy_hitters_topk(
    terms: DataFrame,
    term_col: str = "term",
    k: int = 20,
    width: int = 1000,
) -> DataFrame:
    """Exact top-k terms via Misra-Gries candidate pruning — the 100 TB
    form of a frequency top-k.

    A plain ``groupBy(term).count()`` shuffles the ENTIRE vocabulary
    (billions of long-tail terms at corpus scale) to count the handful
    that matter.  Here each Arrow batch emits only its locally heavy terms
    (local count × width > batch size); by pigeonhole, any term with
    global frequency > N/width is locally heavy in at least one batch, so
    the union of candidates provably contains every global heavy hitter.
    The exact recount then runs with a broadcast semi-join filter BEFORE
    the shuffle — the exchange carries candidate terms only.

    Output equals the exact top-k whenever the k-th frequency exceeds
    N/width (size ``width`` generously: it only grows the candidate set).
    Candidates depend on physical batching, but any superset of the heavy
    set yields the same final answer, so the result is partitioning-
    independent under that condition.
    """
    from collections.abc import Iterator

    import pandas as pd

    col = term_col

    def local_heavy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            counts = b[col].value_counts()
            heavy = counts[counts * width > len(b)]
            yield pd.DataFrame({col: heavy.index})

    candidates = (
        terms.select(col)
        .mapInPandas(local_heavy, f"{col} string")
        .distinct()
    )
    return (
        terms.join(F.broadcast(candidates), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col(col).asc())
        .limit(k)
    )


MAD_SCALE = 1.4826  # Φ⁻¹(0.75) normalization: MAD → σ under normality


def mad_outliers(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    z_cut: float = 3.5,
    decimals: int = 4,
) -> DataFrame:
    """Robust per-group outlier flagging via median absolute deviation:
    z = (x - median) / (MAD_SCALE · MAD); keep rows with |z| > ``z_cut``.

    Median/MAD (exact percentiles) resist the very outliers being hunted,
    unlike mean/stddev.  Two grouped exact-percentile aggregates over the
    group key, then a broadcast join back — the fact stream is scanned
    twice but never shuffled (per-group stats are dimension-sized).
    Exact percentile keeps the oracle comparable; at 100 TB swap in
    ``approx_percentile`` (same plan, sketch-mergeable) when the group's
    value list no longer fits the aggregation buffer.
    """
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, 0.5).alias("__med")
    )
    mad = (
        df.join(F.broadcast(med), group_col)
        .groupBy(group_col)
        .agg(
            F.percentile(F.abs(F.col(value_col) - F.col("__med")), 0.5).alias("__mad"),
            F.first("__med").alias("__med"),
        )
    )
    # nullif guards the all-identical group (MAD = 0): ANSI mode would
    # raise DIVIDE_BY_ZERO; NULL z is never an outlier, the right call
    z = (F.col(value_col) - F.col("__med")) / F.nullif(
        F.lit(MAD_SCALE) * F.col("__mad"), F.lit(0.0)
    )
    return (
        df.join(F.broadcast(mad), group_col)
        .withColumn("robust_z", F.round(z, decimals))
        .filter(F.abs("robust_z") > z_cut)
        .drop("__med", "__mad")
    )
