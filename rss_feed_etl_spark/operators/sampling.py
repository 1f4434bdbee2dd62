"""Sampling / splitting operators for training-data pipelines.

Everything here is *content-addressed*: assignment is a pure function of a
row's key (+ a salt), never of Spark's physical row order or an RNG stream.
That is the property a 100 TB corpus actually needs — re-running the
pipeline, adding documents, or changing partitioning must not move any
existing document across the train/val/test boundary, which
``DataFrame.randomSplit`` (seeded per-partition RNG) cannot guarantee.
All assignments are plain expressions (whole-stage codegen, no shuffle);
the only exchange in quota sampling is the per-group window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_bucket


def split_bucket(key: Column | str, salt: str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5(salt:key)."""
    k = F.col(key) if isinstance(key, str) else key
    return md5_bucket(F.concat(F.lit(salt), F.lit(":"), k.cast("string"))) % n_buckets


def deterministic_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign each row a split label by hash bucket.  ``weights`` maps
    label → percentage (must sum to 100); buckets are carved in the dict's
    iteration order.  Changing ``salt`` re-deals the whole split; keeping
    it pins every key's assignment forever, regardless of what else enters
    the corpus."""
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100, got {weights}")
    bucket = split_bucket(key_col, salt)
    expr: Column | None = None
    hi = 0
    for label, pct in weights.items():
        hi += pct
        cond = bucket < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "mix-v1",
    default_rate: float = 0.0,
    precision: int = 1_000_000,
) -> DataFrame:
    """Down-sample each group to its mixture rate (data mixing by source:
    keep 100% of curated text, 10% of web crawl, …).  A row survives iff
    md5(salt:key) mod ``precision`` < rate × precision — per-row expression
    work only, no shuffle, no state, and the kept set is stable under
    corpus growth/repartitioning and is a strict subset relation across
    rates (raising a group's rate only ADDS documents, never swaps them —
    what incremental corpus rebuilds need).  Groups absent from ``rates``
    get ``default_rate``."""
    bucket = split_bucket(key_col, salt, precision)
    expr: Column = F.lit(int(default_rate * precision))
    for group, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {group!r} must be in [0, 1], got {rate}")
        expr = F.when(F.col(group_col) == group, F.lit(int(rate * precision))).otherwise(expr)
    return df.filter(bucket < expr)


def quota_per_group(
    df: DataFrame,
    group_col: str,
    quota: int,
    key_col: str = "doc_id",
    salt: str = "quota-v1",
    salt_partitions: int | None = None,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen uniformly-at-random
    but deterministically: rank by md5(salt:key) within the group and keep
    the first ``quota``.  This is the data-mixing primitive (cap each
    language/source at N docs) — one hash exchange on the group key.

    ``salt_partitions`` turns on the two-phase skew-safe plan: phase 1
    ranks within ``(group, key_hash % S)`` — a hot group spreads over S
    reducers and at most ``S × quota`` rows survive per group; phase 2
    runs the exact window on that tiny remainder.  Identical output to the
    one-phase plan (each per-salt top-``quota`` is a superset of the
    group's true top-``quota`` members that hash to it), so the choice is
    purely physical.
    """
    rank_key = split_bucket(key_col, salt, 1_000_000_007)
    w = Window.partitionBy(group_col).orderBy(rank_key.asc(), F.col(key_col).asc())
    ranked = df
    if salt_partitions:
        w1 = Window.partitionBy(
            group_col, rank_key % salt_partitions
        ).orderBy(rank_key.asc(), F.col(key_col).asc())
        ranked = (
            ranked.withColumn("__rk1", F.row_number().over(w1))
            .filter(F.col("__rk1") <= quota)
            .drop("__rk1")
        )
    return (
        ranked.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota)
        .drop("__rk")
    )
