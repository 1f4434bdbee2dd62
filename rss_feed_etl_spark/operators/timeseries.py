"""Time-series spine generation and gap filling (hypertable-rollup-style).

The reference's only time-series notion is the lookback window filter
(run_job_filter.py:112-152); a real analytics engine also needs the
inverse: a *dense* per-key daily series even when the raw events are
sparse, so downstream rollups / charts / features see every day.

Scale shape: the day spine is generated per key from that key's own
[min, max] range with ``sequence`` + ``explode`` — no driver-side date
loop, no global calendar table, and a key's spine length is bounded by
its own span.  The LOCF sweep is one window per key ordered by day;
partitions are per-key so the window never globalizes.  Everything is
Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    daily: DataFrame,
    key_col: str = "event_type",
    day_col: str = "day",
    value_col: str = "total",
) -> DataFrame:
    """Densify a per-key daily series and fill gaps by carrying the last
    observation forward.

    ``daily`` has one row per (key, day) for *observed* days.  Output has
    one row per (key, every day in that key's [min, max] span) with:
    - ``<value_col>``: the observed value, NULL on gap days;
    - ``filled_<value_col>``: LOCF value (never NULL — the spine starts at
      each key's first observed day);
    - ``is_gap``: whether the day was absent from the input.
    """
    spine = (
        daily.groupBy(key_col)
        .agg(F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1"))
        .select(
            key_col,
            F.explode(F.sequence("_d0", "_d1", F.expr("INTERVAL 1 DAY"))).alias(day_col),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, [key_col, day_col], "left")
        .withColumn(f"filled_{value_col}", F.last(value_col, ignorenulls=True).over(w))
        .withColumn("is_gap", F.col(value_col).isNull())
    )


def daily_count_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    threshold: float = 0.05,
    window_days: int = 7,
    decimals: int = 6,
) -> DataFrame:
    """Days whose event volume deviates more than ``threshold`` (fraction)
    from the trailing ``window_days`` moving average — the volume-anomaly
    monitor an ingest pipeline alarms on (a feed going dark or doubling).

    The facts reduce to day-grain counts first; the moving-average window
    then runs over calendar-bounded rows (one row per day — years of data
    is still only thousands of rows), so the unpartitioned window is safe
    at any corpus size.  One fact-grain shuffle total.
    """
    daily = events.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    scored = daily.select(
        "day",
        "n",
        F.round(F.avg("n").over(w), decimals).alias("ma"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n"),
        "ma",
        F.round((F.col("n") - F.col("ma")) / F.col("ma"), decimals).alias(
            "pct_dev"
        ),
    )
    return scored.filter(F.abs("pct_dev") > threshold)


def dow_seasonal_residuals(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "total",
    sigmas: float = 2.0,
) -> DataFrame:
    """Day-of-week seasonal decomposition over a day-grain series: expected
    value = the mean of the same weekday across the whole series, residual
    = value − expected, anomaly = |residual| beyond ``sigmas`` standard
    deviations of all residuals.  Separates weekly rhythm from genuine
    volume anomalies — the trailing-MA detector flags every Monday in a
    weekday-heavy stream; this one doesn't.

    Everything after the day-grain input is profile-sized: the 7-row
    weekday profile and the 1-row residual sigma both ride back as
    broadcasts.
    """
    d = daily.select(
        F.col(day_col).alias("day"),
        F.col(value_col).cast("double").alias("val"),
        (F.dayofweek(day_col) - 1).alias("dow"),  # 0=Sunday, matches DuckDB
    )
    profile = d.groupBy("dow").agg(F.round(F.avg("val"), 6).alias("expected"))
    resid = d.join(F.broadcast(profile), "dow").withColumn(
        "residual", F.round(F.col("val") - F.col("expected"), 6)
    )
    sigma = resid.agg(F.round(F.stddev_pop("residual"), 6).alias("sd"))
    return resid.crossJoin(F.broadcast(sigma)).select(
        "day",
        F.col("val").alias(value_col),
        "dow",
        "expected",
        "residual",
        F.when(F.abs(F.col("residual")) > F.lit(sigmas) * F.col("sd"), 1)
        .otherwise(0)
        .alias("is_anomaly"),
    )
