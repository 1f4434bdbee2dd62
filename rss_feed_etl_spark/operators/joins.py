"""Join shapes used by the reference (J1-J5).

All reference joins are single-key equi-joins on the primary key ``link``;
the interesting part at scale is the STRATEGY: the incoming batch side is
small (one feed fetch) against an ever-growing history, so every wrapper
takes ``broadcast_small=True`` and hints Catalyst to broadcast the batch —
history then never shuffles.  Key-set operations the reference does with
Python ``set`` arithmetic (scd1_manager.py:94-110) are semi/anti joins, the
distributed equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def provenance_outer_join(
    new: DataFrame,
    old: DataFrame,
    key: str = "link",
    suffix_old: str = "_old",
    broadcast_new: bool = True,
) -> DataFrame:
    """Full-outer merge with provenance tags (reference J1,
    data_loader.py:147-159): pandas ``indicator=True`` becomes an explicit
    ``provenance`` column computed from per-side presence flags; old-side
    value columns get ``_old`` suffixes like pandas' ``suffixes``."""
    n = (F.broadcast(new) if broadcast_new else new).withColumn("__pn", F.lit(1))
    o = old.withColumn("__po", F.lit(1))
    value_cols_new = [c for c in new.columns if c != key]
    value_cols_old = [c for c in old.columns if c != key]
    j = n.alias("n").join(o.alias("o"), on=key, how="full_outer")
    prov = (
        F.when(F.col("n.__pn").isNotNull() & F.col("o.__po").isNotNull(), F.lit("both"))
        .when(F.col("n.__pn").isNotNull(), F.lit("left_only"))
        .otherwise(F.lit("right_only"))
    )
    return j.select(
        F.col(key),
        *[F.col(f"n.{c}").alias(c) for c in value_cols_new],
        *[F.col(f"o.{c}").alias(f"{c}{suffix_old}") for c in value_cols_old],
        prov.alias("provenance"),
    )


def probe_current(
    new: DataFrame, history: DataFrame, key: str = "link", broadcast_new: bool = True
) -> DataFrame:
    """Left join of the batch against CURRENT history rows (reference J2,
    SCD2 change probe, data_loader.py:246-256)."""
    current = history.filter(F.col("current_flag") == 1)
    n = F.broadcast(new) if broadcast_new else new
    return n.join(current, on=key, how="left")


def removed_keys(
    new: DataFrame, history: DataFrame, key: str = "link", current_only: bool = True
) -> DataFrame:
    """Keys current-in-history but absent from the batch (reference J3,
    ``set(current) - set(new)`` at data_loader.py:295) → left-anti join."""
    h = history.filter(F.col("current_flag") == 1) if current_only else history
    return h.join(F.broadcast(new.select(key)), on=key, how="left_anti")


def updated_keys(new: DataFrame, history: DataFrame, key: str = "link") -> DataFrame:
    """Keys present in both batch and history (reference J4,
    ``new_links & hist_links`` at scd1_manager.py:94-98) → left-semi join."""
    return new.join(history.select(key), on=key, how="left_semi")


def lookup_notes(
    df: DataFrame,
    history: DataFrame,
    key: str = "link",
    notes_col: str = "notes",
) -> DataFrame:
    """Notes lookup-map probe (reference J5, scd1_manager.py:115-129): the
    dict ``link -> notes`` becomes a broadcast hash join + coalesce —
    df's notes win when non-blank, else history's."""
    from ..functions.text import blank_to_null

    lut = F.broadcast(
        history.filter(F.trim(F.col(notes_col)) != "")
        .select(key, F.col(notes_col).alias("__hist_notes"))
        .dropDuplicates([key])
    )
    return (
        df.join(lut, on=key, how="left")
        .withColumn(notes_col, F.coalesce(blank_to_null(F.col(notes_col)), F.col("__hist_notes"), F.lit("")))
        .drop("__hist_notes")
    )
