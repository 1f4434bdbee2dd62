"""Parquet table IO (reference S3/S4 — worksheet read / clear-and-rewrite).

The reference's storage engine is Google Sheets: every load reads the whole
worksheet (S3) and every save clears and rewrites it (S4,
data_loader.py:426-428) — O(history) write amplification per batch.  Here
tables are Parquet directories:

- reads are lazy scans with pushdown/pruning;
- ``write_overwrite`` reproduces the reference's overwrite semantics where
  required (small dimension/output tables);
- ``write_partitioned`` is the scale path: partition by ingest date so the
  date-window queries prune structurally and incremental merges rewrite
  only the touched partitions (dynamic partition overwrite), never the
  whole history.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OVERWRITE_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


@contextlib.contextmanager
def _dynamic_partition_overwrite(spark: SparkSession):
    """Set partitionOverwriteMode=dynamic for one write, then restore the
    previous value — the session is shared, and leaving dynamic mode on
    silently changes the semantics of later partitioned overwrites that
    expect static mode."""
    try:
        prev = spark.conf.get(_OVERWRITE_MODE_KEY)
    except Exception:  # noqa: BLE001 — unset
        prev = None
    spark.conf.set(_OVERWRITE_MODE_KEY, "dynamic")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_OVERWRITE_MODE_KEY)
        else:
            spark.conf.set(_OVERWRITE_MODE_KEY, prev)


def read_table(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_or_empty(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Create-if-missing read (the reference creates the worksheet with a
    header row when absent, data_loader.py:74-113)."""
    try:
        return spark.read.schema(schema).parquet(path)
    except Exception:  # noqa: BLE001 — missing path
        return spark.createDataFrame([], schema)


def write_overwrite(df: DataFrame, path: str) -> None:
    """Clear-and-rewrite sink (reference S4)."""
    df.write.mode("overwrite").parquet(path)


def write_partitioned(df: DataFrame, path: str, ts_col: str = "published") -> None:
    """Scale sink: partition by ingest date, overwrite only touched
    partitions.  Requires spark.sql.sources.partitionOverwriteMode=dynamic
    (set here per-write)."""
    spark = df.sparkSession
    with _dynamic_partition_overwrite(spark):
        (
            df.withColumn("ingest_date", F.to_date(F.col(ts_col)))
            .write.mode("overwrite")
            .partitionBy("ingest_date")
            .parquet(path)
        )


def write_partitioned_incremental(
    merged: DataFrame,
    batch: DataFrame,
    history: DataFrame,
    path: str,
    key: str = "link",
    ts_col: str = "published",
) -> list:
    """Incremental merge sink: dynamic-partition-overwrite ONLY the ingest
    dates the batch touched, never the whole history (the fix for the
    reference's clear-and-rewrite, data_loader.py:426-428).

    Touched dates = dates of the batch rows ∪ dates of the HISTORY versions
    of keys present in the batch — the second term matters because an
    update can move a row to a new date, and the stale version must vanish
    from its old partition.  The date list is driver-sized (days, not
    rows); the write scans `merged` once with a partition filter, and
    untouched partition directories are not rewritten.  Returns the list of
    touched dates (for observability/testing).
    """
    spark = merged.sparkSession
    batch_keys = batch.select(key).distinct()
    touched = (
        batch.select(F.to_date(F.col(ts_col)).alias("d"))
        .unionByName(
            history.join(batch_keys, key, "left_semi").select(
                F.to_date(F.col(ts_col)).alias("d")
            )
        )
        .distinct()
    )
    dates = sorted(r["d"] for r in touched.collect() if r["d"] is not None)
    if not dates:  # empty batch → nothing to rewrite
        return dates
    with _dynamic_partition_overwrite(spark):
        (
            merged.withColumn("ingest_date", F.to_date(F.col(ts_col)))
            .filter(F.col("ingest_date").isin(dates))
            .write.mode("overwrite")
            .partitionBy("ingest_date")
            .parquet(path)
        )
    return dates


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = "ingest_date",
) -> int:
    """Small-file compaction for a streaming-sink table.

    Micro-batch sinks accrete one file per (batch × task) — after a day of
    15-minute triggers a partition holds hundreds of KB-sized files, and
    every later scan pays per-file open/footer costs (the #1 operational
    pathology of streaming parquet sinks).  Rewrite the table with each
    output file sized toward ``target_file_bytes`` using per-partition
    ``repartition`` on the partition column (falls back to a single
    size-based coalesce for unpartitioned tables).  Returns the number of
    files after compaction.

    The rewrite is read-all-then-overwrite, so run it OFFLINE relative to
    writers (on a lakehouse table format this is OPTIMIZE/compaction with
    snapshot isolation; plain Parquet directories have no atomic swap).
    """
    import math
    import pathlib
    import shutil

    df = spark.read.parquet(path)
    total_bytes = sum(
        f.stat().st_size for f in pathlib.Path(path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    if partition_col and partition_col in df.columns:
        out = df.repartition(n_files, F.col(partition_col))
        writer = out.write.mode("overwrite").partitionBy(partition_col)
    else:
        out = df.repartition(n_files)
        writer = out.write.mode("overwrite")
    # stage to a sibling dir then swap: plain-parquet best effort at
    # not destroying the table if the rewrite dies mid-flight
    staged = path.rstrip("/") + "__compacting"
    writer.parquet(staged)
    shutil.rmtree(path)
    shutil.move(staged, path)
    return sum(1 for _ in pathlib.Path(path).rglob("*.parquet"))


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str = "link",
    buckets: int = 64,
) -> None:
    """Bucketed sink: pre-shuffle the table ONCE at write time so every
    later equi-join / groupBy on ``key`` is exchange-free.

    The reference re-reads and re-merges the whole history table on every
    run (data_loader.py:353-430); its Spark analog probes history on the
    primary key per batch.  Hash-bucketing the stored history by that key
    (+ sorting within buckets) means those probes compile to a
    SortMergeJoin with NO Exchange on the history side — at 100 TB the
    history is written pre-partitioned and never moves again; only the
    small batch side shuffles into the same bucketing.  ``path`` makes the
    table external so storage location is explicit (no warehouse writes).
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Z-order (Morton) interleave of the per-column RANKS — the
    multi-dimensional clustering key.  Each column is first reduced to a
    ``bits``-bit bucket via ``xxhash64``-free percentile-ish quantization
    (min/max scaling is done by the caller via ``ntile`` or plain integer
    columns), then bits interleave so rows close in ANY dimension land
    close in the sort order.

    Pure Catalyst bit arithmetic — no UDF."""
    import functools

    from pyspark.sql import functions as F

    def to_col(c):
        return F.col(c) if isinstance(c, str) else c

    interleaved = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(to_col(c).cast("long"), b).bitwiseAND(1)
            interleaved = interleaved.bitwiseOR(
                F.shiftleft(bit, b * n + i).cast("long")
            )
    return interleaved


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write parquet clustered by the Z-order of ``cols`` (integer-valued
    columns; quantize floats/strings to integer buckets first).

    Why: parquet row-group min/max stats prune scans only when values are
    CLUSTERED within files.  A single-column sort clusters one dimension
    and destroys the others; Z-ordering interleaves the dimensions so
    range predicates on ANY of them skip most files/row-groups — the
    standard lakehouse layout trick for multi-dimension query tables.
    ``repartitionByRange`` on the z-value gives ~equal-sized,
    range-disjoint files; the within-partition sort tightens row-group
    stats further.
    """
    z = zorder_value([F.col(c) for c in cols], bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def plan_compaction(
    files: DataFrame,
    partition_col: str,
    file_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction plan: assign each partition's files to
    rewrite bins of ~``target_bytes`` so a compactor can merge every bin
    into one output file.  The streaming-sink disease at scale is millions
    of kilobyte files; this emits the rewrite batches that fix it.

    Bin assignment is next-fit over the per-partition cumulative size in
    (bytes desc, file) order: bin = floor((cumsum − bytes) / target) — a
    pure window expression, deterministic, no driver-side bin-packing
    loop.  Next-fit is within 2× of optimal bin count and, unlike
    first-fit-decreasing, needs no sequential state.

    Plan shape (100 TB): file MANIFEST grain (one row per file), windowed
    per partition key — no single global window, so a table with millions
    of files across thousands of partitions spreads evenly.  Output adds
    (bin, bin_bytes, n_bin_files) per file row.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(bytes_col).desc(), F.col(file_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = files.withColumn(
        "bin",
        F.floor(
            (F.sum(bytes_col).over(w) - F.col(bytes_col))
            / F.lit(float(target_bytes))
        ).cast("int"),
    )
    wb = Window.partitionBy(partition_col, "bin")
    return staged.select(
        partition_col,
        file_col,
        bytes_col,
        "bin",
        F.sum(bytes_col).over(wb).cast("bigint").alias("bin_bytes"),
        F.count("*").over(wb).cast("bigint").alias("n_bin_files"),
    )


def read_orc(spark, path: str):
    """ORC source — the other columnar lake format this engine reads
    natively (predicate pushdown + column pruning work the same as
    parquet's; Spark ships the reader built-in)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zlib") -> None:
    """ORC sink (zlib default, snappy/zstd accepted) — for downstreams
    standardized on Hive/ORC rather than parquet."""
    df.write.mode("overwrite").option("compression", compression).orc(path)
