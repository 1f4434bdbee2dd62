"""Bucketed storage: joins and aggregations on the bucket key must compile
without an Exchange on the bucketed side — the physical property the 100 TB
history layout depends on."""

import contextlib
import io
import os

from pyspark.sql import functions as F

from rss_feed_etl_spark import testdata as td
from rss_feed_etl_spark.sources import parquet as pio

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_agg_and_join_have_no_history_exchange(spark, tmp_path):
    stage = td.load_table(spark, SF_DIR, "documents").select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("link"),
        F.col("text").alias("summary"),
        "source",
    )
    pio.write_bucketed(stage, "hist_bucketed", str(tmp_path / "hist"), key="link", buckets=8)
    pio.write_bucketed(stage, "batch_bucketed", str(tmp_path / "batch"), key="link", buckets=8)
    hist = spark.table("hist_bucketed")
    batch = spark.table("batch_bucketed")

    try:
        # groupBy on the bucket key: partial+final agg collapse, no shuffle
        agg_plan = _plan(hist.groupBy("link").agg(F.count(F.lit(1)).alias("n")))
        assert "Exchange" not in agg_plan, agg_plan

        # equi-join of two same-bucketed tables: SMJ with no Exchange at all
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        join_plan = _plan(hist.join(batch, "link"))
        assert "Exchange" not in join_plan, join_plan
        assert "SortMergeJoin" in join_plan

        joined = hist.join(batch, "link").count()
        assert joined == stage.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS hist_bucketed")
        spark.sql("DROP TABLE IF EXISTS batch_bucketed")
