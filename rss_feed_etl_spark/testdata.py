"""Binding of the driver's synthetic tables to the engine's data model.

The correctness harness runs on TPC-H-ish parquet at /root/testdata/sf*/
(see TESTDATA.md).  FIXTURES.md §7 maps ``events`` onto the reference's
``stage`` table; these helpers define that mapping ONCE so the entry
contract, tests, and bench all agree with the DuckDB oracle SQL.

Determinism: the driver forbids wall-clock in verified queries, so the
"now" of every windowed/stamped query is the fixed ``AS_OF`` just after the
events' time range (events span 2024-01-01..2024-01-30 at every sf), and
the history/batch split for merge operators is the fixed ``CUTOFF``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

AS_OF = "2024-01-31 00:00:00"  # fixed "now" for windows/stamps
AS_OF_PREV = "2024-01-27 00:00:00"  # the "previous run" stamp (append-mode)
CUTOFF = "2024-01-24 00:00:00"  # history (< cutoff) vs new batch (>= cutoff)
RECENT = "2024-01-30 00:00:00"  # 1-day batch for anti/semi key-set queries
SCD2_START = "2024-01-01 00:00:00"  # effective_start of synthesized history
SCD2_CLOSED_END = "2024-01-15 00:00:00"  # effective_end of closed versions
DAYS_BACK = 7

# keyword-exclusion config analog (reference config/config.yaml:113-183
# excludes ~50 keywords per column; here two columns with literal keywords,
# including one with a regex metachar to pin the escaping semantics)
EXCLUDE_KEYWORDS: dict[str, list[str]] = {
    "entry_title": ["error", "signup 1", "(test)"],
    "job_title": ["purchase"],
}


# Timestamp columns stored as INT64 TIMESTAMP(NANOS) in the driver's parquet.
# Spark (through 4.x) cannot read parquet nanos timestamps natively; the
# supported path is the legacy nanosAsLong read + an explicit nanos→micros
# conversion.  DuckDB truncates nanos→µs the same way, so oracle parity holds.
NANOS_TS_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Parquet timestamp read semantics (nanosAsLong, no NTZ inference) live in
    # session.get_spark/tune_session so every read path agrees; re-assert here
    # for robustness on sessions that bypassed both (e.g. a bare driver
    # session handed straight to a query callable).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NANOS_TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def stage_rows(events: DataFrame) -> DataFrame:
    """events → one stage row per event (link unique per row).

    Column mapping (FIXTURES.md §1 semantics):
    - ``summary`` mixes real payloads with ''/'nan' sentinels so the
      non-empty-content filter (P5) is selective;
    - ``notes`` is mostly blank with some real annotations so notes
      preservation in merges is exercised;
    - ``published`` keeps the real event timestamp.
    """
    return events.select(
        F.col("event_type").alias("job_title"),
        F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("link"),
        F.concat_ws(" ", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "entry_title"
        ),
        F.col("ts").alias("published"),
        F.concat(F.lit("feed"), (F.col("user_id") % 14).cast("string")).alias("feed_title"),
        F.lit("rss.app").alias("reader"),
        F.lit("15min").alias("time_window"),
        F.when(F.col("value") < 1.0, F.lit(""))
        .when(F.col("value") < 2.0, F.lit("nan"))
        .otherwise(F.col("props"))
        .alias("summary"),
        F.when(F.col("user_id") % 10 == 0, F.concat(F.lit("note-"), F.col("user_id").cast("string")))
        .otherwise(F.lit(""))
        .alias("notes"),
        F.col("event_id"),  # arrival-order column for deterministic dedup
        F.col("ts"),
    )


def stage_keyed(events: DataFrame) -> DataFrame:
    """events → stage rows keyed by user (link='u<user_id>', duplicates per
    key across time).  This is the shape merge operators consume: batches
    with repeated keys where "latest wins" needs an explicit order column
    (SURVEY §7.3 — Spark gives no row-order guarantee, so keep-last is a
    row_number over (ts, event_id) desc, not pandas ``keep="last"``)."""
    return events.select(
        F.col("event_type").alias("job_title"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("link"),
        F.concat_ws(" ", F.col("event_type"), (F.col("event_id") % 100).cast("string")).alias(
            "entry_title"
        ),
        F.col("ts").alias("published"),
        F.concat(F.lit("feed"), (F.col("user_id") % 14).cast("string")).alias("feed_title"),
        F.lit("rss.app").alias("reader"),
        F.lit("15min").alias("time_window"),
        F.when(F.col("value") < 1.0, F.lit("")).otherwise(F.col("props")).alias("summary"),
        F.when((F.col("event_id") % 3) == 0, F.concat(F.lit("note-"), (F.col("event_id") % 7).cast("string")))
        .otherwise(F.lit(""))
        .alias("notes"),
        F.col("event_id"),
        F.col("ts"),
    )


# The same mapping as DuckDB SQL fragments, used by oracle_sql() entries.
STAGE_ROWS_SQL = """
SELECT event_type AS job_title,
       'e' || CAST(event_id AS VARCHAR) AS link,
       event_type || ' ' || CAST(user_id AS VARCHAR) AS entry_title,
       ts AS published,
       'feed' || CAST(user_id % 14 AS VARCHAR) AS feed_title,
       'rss.app' AS reader,
       '15min' AS time_window,
       CASE WHEN value < 1.0 THEN '' WHEN value < 2.0 THEN 'nan' ELSE props END AS summary,
       CASE WHEN user_id % 10 = 0 THEN 'note-' || CAST(user_id AS VARCHAR) ELSE '' END AS notes,
       event_id,
       ts
FROM events
"""

STAGE_KEYED_SQL = """
SELECT event_type AS job_title,
       'u' || CAST(user_id AS VARCHAR) AS link,
       event_type || ' ' || CAST(event_id % 100 AS VARCHAR) AS entry_title,
       ts AS published,
       'feed' || CAST(user_id % 14 AS VARCHAR) AS feed_title,
       'rss.app' AS reader,
       '15min' AS time_window,
       CASE WHEN value < 1.0 THEN '' ELSE props END AS summary,
       CASE WHEN event_id % 3 = 0 THEN 'note-' || CAST(event_id % 7 AS VARCHAR) ELSE '' END AS notes,
       event_id,
       ts
FROM events
"""

# shared skills-lexicon constants (used by both the expression-based
# skills_match and the stub-client llm_match_scores driver queries)
LEXICON = [
    "spark", "table", "join", "merge", "filter", "query", "stream",
    "batch", "window", "sort", "hash", "vector", "column", "agg",
]
RESUME_SKILLS = ["spark", "join", "filter", "stream", "window", "hash"]
