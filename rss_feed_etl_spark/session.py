"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every default here is chosen so the
same code is correct on a large multi-executor cluster: AQE owns runtime
partition coalescing and skew-join splitting, shuffle partitions default to
the parallelism of the session rather than Spark's legacy 200, and the
session time zone is pinned to UTC so timestamp semantics match across
engines (the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "rss-feed-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or default_cpus()
    driver_mem = os.environ.get("SPARK_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        # Initial shuffle partitions = 4× parallelism, NOT == parallelism:
        # AQE can only coalesce DOWN from the initial count, so an initial
        # that exactly matches the core count caps every post-shuffle
        # stage at one wave of full-size partitions — measured on the 10×
        # corpus (round 10): the ngram pair aggregate warm run took
        # 71.5 s at 32 initial partitions vs 14.9 s at 128 on the same
        # 32-core session (big per-task hash-agg state tips into
        # sort-spill; 4× smaller tasks stay in memory and stragglers
        # rebalance).  Small exchanges still coalesce to few tasks under
        # the advisory size, so tiny queries pay nothing.  Scales with
        # the session's core count rather than hard-coding either local
        # or cluster values (guide §2.2).
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 4 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's coalescing target (default 64m) is sized for I/O-bound
        # cluster stages; for CPU-bound aggregations it merges mid-size
        # exchanges into a handful of giant partitions whose hash-agg
        # state spills and leaves most cores idle.  Measured on the 10×
        # scale corpus (round 10): the ngram-Jaccard pair aggregate
        # (~700 MB exchange, 30M distinct keys) coalesced to ~11
        # partitions on 32 cores and ran 36–114 s; at an 8m advisory it
        # keeps the session's full parallelism and runs 10–25 s.  The
        # right value scales with per-task execution memory (here
        # 16g × 0.6 / 32 cores ≈ 300 MB, vs a hash-agg in-memory
        # expansion of 10–30× over compressed shuffle bytes), so it is
        # an env knob: production clusters with 4–8 GB per task slot
        # raise it back to 64–256m (guide §2.2/§9); the local default
        # keeps tiny exchanges coalesced (still one task below 8m)
        # without starving CPU-bound mid-size stages.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PART", "8m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        # Commit and pre-touch the heap up front: with the default tiny
        # -Xms, the first memory-heavy query pays ~10 GB of heap growth +
        # first-touch page faults inside its own runtime (measured on the
        # 10× corpus: cold ngram run 92.8 s → 61.4 s with pre-touch,
        # identical warm runs).  One-time session-startup cost instead of
        # a distortion of whichever query happens to run first.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:+AlwaysPreTouch",
        )
        .config("spark.ui.enabled", "false")
        # Console progress bars write \r-terminated stage lines that bury
        # real stdout (the bench's headline JSON was truncated out of the
        # round-4 record by them) — keep driver stdout clean.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    return builder.getOrCreate()


_PYFILES_ADDED: set[int] = set()


def ensure_executors_can_import(spark: SparkSession) -> None:
    """Ship this package to executors via addPyFile.

    Pure-expression operators never run Python on executors, but the
    ``mapInPandas`` operators (RSS fetch, enrichment, multimodal) pickle
    closures that reference this package by module name — if the driver's
    cwd is not the repo root, Spark's python workers cannot import it.
    Zipping the package once per process and ``addPyFile``-ing it makes the
    operators location-independent (works on driver-provided sessions too,
    since addPyFile is a runtime call).
    """
    import os
    import tempfile
    import zipfile

    key = id(spark.sparkContext)
    if key in _PYFILES_ADDED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"rss_feed_etl_spark-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _PYFILES_ADDED.add(key)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally provided session.

    The driver harness hands us an already-built SparkSession; static configs
    (master, memory) are fixed, but these runtime SQL configs are what our
    operator semantics depend on (UTC timestamps for oracle parity, AQE for
    skew/coalesce at scale).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # see get_spark: CPU-bound-aggregate coalescing target, env-tunable
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        os.environ.get("SPARK_GRAFT_ADVISORY_PART", "8m"),
    )
    # Timestamp read semantics for the driver's parquet (naive INT64 nanos):
    # read as plain UTC TIMESTAMP (not NTZ) and surface nanos as longs for the
    # explicit nanos→micros conversion in testdata.load_table.  Kept here so
    # EVERY session and read path (not just load_table) agrees — DuckDB
    # applies the same semantics to the same files, so oracle parity holds.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark
