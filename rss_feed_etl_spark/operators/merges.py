"""Composite merge operators — SCD1 / upsert / SCD2 (reference M1-M3).

These are the heart of the reference pipeline
(src/etl/scd1_manager.py:10-176, src/rss_feed_etl/core/data_loader.py:115-314,
src/etl/scd2_manager.py:8-196).  The reference materializes pandas frames and
runs O(keys × rows) Python loops; here each merge is ONE declarative plan:

    batch ⟗ history  (full-outer hash join on the key)
      → per-column coalesce / change-detection expressions (codegen'd)
      → (SCD2) explode into expired + new-version rows
      → union with untouched history partitions

Scale notes:
- The join shuffles both sides on the key once; when the incoming batch is
  small relative to history (the reference's shape: a feed batch vs months
  of history), ``broadcast_batch=True`` broadcasts it and history never
  shuffles at all — the merge becomes a map-side join over history's
  existing layout.
- Change detection compares *stringified* values with ''-for-NULL exactly
  like the reference (astype(str) + fillna('') — scd1_manager.py:45,53,
  scd2_manager.py:94); see SURVEY §7.3 "string-typed comparison semantics".
- On a real lakehouse this plan is what Delta's ``MERGE INTO`` compiles to;
  the operator keeps the plan explicit so it runs on plain Parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import blank_to_null


def _norm(c: Column) -> Column:
    """Reference comparison normalization: stringify, NULL→'' (F6/F12)."""
    return F.coalesce(c.cast("string"), F.lit(""))


def _changed(new_prefix: str, old_prefix: str, compare_cols: list[str]) -> Column:
    cond = F.lit(False)
    for c in compare_cols:
        cond = cond | (_norm(F.col(f"{new_prefix}.{c}")) != _norm(F.col(f"{old_prefix}.{c}")))
    return cond


def merge_scd1(
    batch: DataFrame,
    history: DataFrame,
    key: str = "link",
    notes_col: str = "notes",
    broadcast_batch: bool = True,
) -> DataFrame:
    """SCD1 upsert, no history kept (reference M1, scd1_manager.py:10-176).

    - history rows never deleted;
    - keys in both: new values overwrite, but ``notes`` is preserved from
      history when the new notes are blank-ish (''/'nan'/NULL —
      scd1_manager.py:115-129);
    - new keys appended.

    Callers dedup the batch keep-last first (dedup.dedup_by_key) — the
    reference does the same at ingest (scd1_manager.py:231).
    """
    value_cols = [c for c in batch.columns if c != key]
    b = _with_presence(F.broadcast(batch) if broadcast_batch else batch, "__present")
    j = b.alias("n").join(history.alias("h"), on=key, how="full_outer")
    n_in = F.col("n.__present").isNotNull()
    out_cols = [F.col(key)]
    for c in value_cols:
        if c == notes_col:
            expr = F.when(
                n_in, F.coalesce(blank_to_null(F.col(f"n.{c}")), F.col(f"h.{c}"))
            ).otherwise(F.col(f"h.{c}"))
        else:
            expr = F.when(n_in, F.col(f"n.{c}")).otherwise(F.col(f"h.{c}"))
        out_cols.append(expr.alias(c))
    return j.select(*out_cols)


def _with_presence(df: DataFrame, flag: str) -> DataFrame:
    """Explicit row-presence literal for full-outer joins.

    pandas exposes a ``_merge`` indicator; in Spark, inferring presence
    from "some column is non-null" is wrong (legitimately all-null value
    rows exist), so each side carries a constant flag column instead.
    """
    return df.withColumn(flag, F.lit(1))


def merge_upsert(
    batch: DataFrame,
    history: DataFrame,
    key: str = "link",
    notes_col: str = "notes",
    compare_cols: list[str] | None = None,
    broadcast_batch: bool = True,
    with_flags: bool = False,
) -> DataFrame:
    """Legacy upsert with change detection (reference M2,
    data_loader.py:115-207): full-outer merge; rows present in both take the
    NEW values but keep the OLD notes when history has any; history-only
    rows survive unchanged; ``with_flags`` adds provenance + changed flags
    (drives the inserted/updated counts, A1).
    """
    value_cols = [c for c in batch.columns if c != key]
    compare_cols = compare_cols or [c for c in value_cols if c != notes_col]
    b = _with_presence(F.broadcast(batch) if broadcast_batch else batch, "__present")
    h = _with_presence(history, "__present")
    j = b.alias("n").join(h.alias("h"), on=key, how="full_outer")
    n_in = F.col("n.__present").isNotNull()
    h_in = F.col("h.__present").isNotNull()
    changed = n_in & h_in & _changed("n", "h", compare_cols)
    out_cols = [F.col(key)]
    for c in value_cols:
        if c == notes_col:
            expr = (
                F.when(n_in & h_in, F.coalesce(blank_to_null(F.col(f"h.{c}")), F.col(f"n.{c}")))
                .when(n_in, F.col(f"n.{c}"))
                .otherwise(F.col(f"h.{c}"))
            )
        else:
            expr = F.when(n_in, F.col(f"n.{c}")).otherwise(F.col(f"h.{c}"))
        out_cols.append(expr.alias(c))
    if with_flags:
        out_cols.append((n_in & ~h_in).cast("int").alias("inserted"))
        out_cols.append(changed.cast("int").alias("updated"))
    return j.select(*out_cols)


def merge_scd2(
    batch: DataFrame,
    history: DataFrame,
    key: str = "link",
    as_of: str = "1970-01-01 00:00:00",
    notes_col: str = "notes",
    compare_cols: list[str] | None = None,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Type-2 merge (reference M3, data_loader.py:209-314).

    Given ``history`` with (``effective_start``, ``effective_end``,
    ``current_flag``) and a ``batch`` of plain rows:

    - current rows whose key changed or disappeared from the batch are
      expired: ``effective_end = as_of, current_flag = 0``;
    - new + changed keys get a fresh version: ``effective_start = as_of,
      effective_end = NULL, current_flag = 1``, with notes preserved from
      the prior current version when the new notes are blank (the packaged
      semantics, data_loader.py:290-292 — the legacy scd2_manager resets
      notes; we keep the packaged behavior, pinned by tests);
    - unchanged current rows and already-closed rows pass through untouched.

    Single full-outer join + array-explode → at most 2 output rows per
    joined key, one shuffle; closed history never joins at all (it unions
    straight through, so the 100 TB history tail is scan-only).
    """
    scd_cols = ["effective_start", "effective_end", "current_flag"]
    value_cols = [c for c in batch.columns if c != key]
    compare_cols = compare_cols or [c for c in value_cols if c != notes_col]
    as_of_ts = F.to_timestamp(F.lit(as_of))

    current = history.filter(F.col("current_flag") == 1)
    closed = history.filter(F.col("current_flag") != 1)

    b = _with_presence(F.broadcast(batch) if broadcast_batch else batch, "__present")
    h = _with_presence(current, "__present")
    j = b.alias("n").join(h.alias("h"), on=key, how="full_outer")
    n_in = F.col("n.__present").isNotNull()
    h_in = F.col("h.__present").isNotNull()
    changed = n_in & h_in & _changed("n", "h", compare_cols)
    removed = h_in & ~n_in
    new_key = n_in & ~h_in

    def row_struct(values: list[Column]) -> Column:
        names = value_cols + scd_cols
        return F.struct(*[v.alias(c) for c, v in zip(names, values)])

    keep_current = row_struct(
        [F.col(f"h.{c}") for c in value_cols]
        + [F.col("h.effective_start"), F.col("h.effective_end"), F.col("h.current_flag")]
    )
    expired = row_struct(
        [F.col(f"h.{c}") for c in value_cols]
        + [F.col("h.effective_start"), as_of_ts, F.lit(0)]
    )
    new_version_vals = []
    for c in value_cols:
        if c == notes_col:
            new_version_vals.append(
                F.coalesce(blank_to_null(F.col(f"n.{c}")), F.col(f"h.{c}")).cast("string")
            )
        else:
            new_version_vals.append(F.col(f"n.{c}"))
    new_version = row_struct(
        new_version_vals + [as_of_ts, F.lit(None).cast("timestamp"), F.lit(1)]
    )

    rows = F.array_compact(
        F.array(
            F.when(h_in & ~changed & ~removed, keep_current),
            F.when(changed | removed, expired),
            F.when(new_key | changed, new_version),
        )
    )
    merged = (
        j.select(F.col(key), F.explode(rows).alias("__r"))
        .select(key, *[F.col(f"__r.{c}").alias(c) for c in value_cols + scd_cols])
    )
    closed_proj = closed.select(key, *value_cols, *scd_cols)
    return merged.unionByName(closed_proj)


def merge_counts(
    batch: DataFrame,
    history: DataFrame,
    key: str = "link",
    notes_col: str = "notes",
    compare_cols: list[str] | None = None,
    current_only: bool = False,
) -> DataFrame:
    """Inserted / updated / removed metrics (reference A1:
    data_loader.py:203-207, 310-314; scd1_manager.py:132-142).

    One aggregate over the same full-outer join the merges use —
    ``sum(when(...))`` gives the three counters in a single pass.
    """
    value_cols = [c for c in batch.columns if c != key]
    compare_cols = compare_cols or [c for c in value_cols if c != notes_col]
    h0 = history.filter(F.col("current_flag") == 1) if current_only else history
    b = _with_presence(batch, "__present")
    h = _with_presence(h0, "__present")
    j = b.alias("n").join(h.alias("h"), on=key, how="full_outer")
    n_in = F.col("n.__present").isNotNull()
    h_in = F.col("h.__present").isNotNull()
    changed = n_in & h_in & _changed("n", "h", compare_cols)
    return j.agg(
        F.sum((n_in & ~h_in).cast("bigint")).alias("inserted"),
        F.sum(changed.cast("bigint")).alias("updated"),
        F.sum((h_in & ~n_in).cast("bigint")).alias("removed"),
    )


def sort_output(
    df: DataFrame, ts_col: str = "published", key: str = "link"
) -> DataFrame:
    """Stable output ordering: published desc (nulls last), key asc
    (reference O1, scd1_manager.py:158-166)."""
    return df.orderBy(F.col(ts_col).desc_nulls_last(), F.col(key).asc())
