"""JSON-lines source/sink.

The reference exchanges no JSON files (its only JSON surface is embedded
strings — F14/F15), but JSONL is the lingua franca of training-data
pipelines, so the engine treats it as a first-class format next to
Parquet/CSV.

Scale rules baked in here:

- **Always pass a schema on read.**  Schema inference reads the data once
  just to guess types — at 100 TB that is a full extra pass, and a wrong
  guess (all-null column → string) silently corrupts downstream plans.
  ``read_jsonl`` therefore REQUIRES an explicit ``StructType``; malformed
  lines land in ``_corrupt_record`` under PERMISSIVE mode instead of
  failing the job.
- **JSONL is a wire format, not a table format.**  No predicate pushdown,
  no column pruning, no stats — ``jsonl_to_parquet`` is the one-pass
  converter a pipeline should run before anything query-shaped happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSON-lines with an explicit schema (never inferred).

    Default: ``DROPMALFORMED`` silently skips unparseable lines.  With
    ``keep_corrupt=True`` the read runs PERMISSIVE and each failure lands
    verbatim in ``_corrupt_record`` for a quarantine sink.  (The two can't
    share one plan: Spark forbids queries that reference only the corrupt
    column — e.g. ``count()`` after filtering it — so the dropping variant
    must not carry the column at all.)
    """
    if not keep_corrupt:
        return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    # copy — StructType.add mutates the receiver, and the caller's schema
    # must stay corrupt-column-free for later writes
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Write JSON-lines, gzip-compressed by default (JSONL is 5-10×
    whitespace+keys overhead vs Parquet; never ship it uncompressed)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def jsonl_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: T.StructType,
    partition_by: list[str] | None = None,
) -> None:
    """One-pass JSONL → Parquet conversion (the ingest step that makes
    every later scan prunable and pushdown-able)."""
    df = read_jsonl(spark, src, schema)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dest)
