"""Structured Streaming wrappers (reference §2.9 — implied streaming).

The reference has no streaming runtime: "streaming" is cron re-runs of the
whole pipeline with lookback windows, made idempotent by the SCD1 upsert
(scd1_manager.py:18-21).  The idiomatic Spark translation:

- micro-batch ingest: ``readStream`` over the landing directory (or any
  streaming source), ``Trigger.AvailableNow`` for the cron-like catch-up
  run, processing-time triggers for continuous mode;
- state lives in the SINK table, exactly like the reference's
  table-resident history: each micro-batch runs the same idempotent SCD1
  merge via ``foreachBatch`` — no ``mapGroupsWithState``, because the merge
  target IS the state (SURVEY §7.3);
- event-time semantics: watermark + windowed aggregation for the
  lookback/late-data behavior.

At scale the foreachBatch merge writes through ``write_partitioned``
(dynamic partition overwrite), so a micro-batch touches only the ingest
dates it contains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import dedup_by_key
from ..operators.merges import merge_scd1
from ..sources.parquet import (
    read_or_empty,
    write_overwrite,
    write_partitioned_incremental,
)


def read_stage_stream(
    spark: SparkSession, landing_dir: str, schema: T.StructType
) -> DataFrame:
    return spark.readStream.format("parquet").schema(schema).load(landing_dir)


def incremental_scd1(
    stream: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    key: str = "link",
    order_cols: list[str] | None = None,
    available_now: bool = True,
    partitioned: bool = False,
    ts_col: str = "published",
):
    """foreachBatch SCD1 merge: state = the target table.

    Each micro-batch is deduped keep-last (A2) then merged (M1) into the
    current target snapshot; re-delivered rows are idempotent by key.
    ``partitioned=True`` is the scale sink: the target is stored
    partitioned by ingest date and each micro-batch dynamic-overwrites
    ONLY the dates it touched (write_partitioned_incremental) — per-batch
    write cost tracks the batch, not the history.  Returns the started
    StreamingQuery.
    """
    spark = stream.sparkSession
    schema = stream.schema
    order_cols = order_cols or ["published"]

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        deduped = dedup_by_key(batch_df, key, order_cols, keep="last")
        history = read_or_empty(spark, target_path, schema)
        if "ingest_date" in history.columns:
            history = history.drop("ingest_date")
        merged = merge_scd1(deduped, history, key=key)
        # materialize fully before the overwrite below (reading the target
        # while rewriting it would race); merge output is one snapshot
        merged_cached = merged.localCheckpoint(eager=True)
        if partitioned:
            write_partitioned_incremental(
                merged_cached, deduped, history, target_path, key=key, ts_col=ts_col
            )
        else:
            write_overwrite(merged_cached, target_path)

    writer = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="15 seconds")
    return writer.start()


def dedup_stream(
    stream: DataFrame,
    key: str = "link",
    ts_col: str = "published",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming re-delivery suppression: drop rows whose key was already
    seen within the watermark horizon (``dropDuplicatesWithinWatermark``).

    This is the reference's at-ingest dedup (A2) as a true streaming
    operator: the dedup state is bounded — keys older than the watermark
    are evicted — so it runs forever on unbounded input, unlike a plain
    ``dropDuplicates`` whose state grows without bound.  Which row of a
    duplicate set survives is arrival-order-dependent (first delivery
    wins); the SCD1 merge downstream stays idempotent either way, this
    just stops duplicate work earlier.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "published",
    watermark: str = "1 hour",
    window_len: str = "1 day",
    group_col: str = "feed_title",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark —
    the streaming analog of the reference's ``days_back``/``hours_lookback``
    windows (run_job_filter.py:133, run_ats_enrichment.py:533)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len), F.col(group_col))
        .agg(F.count("*").alias("n_entries"))
    )


def incremental_dedup_ingest(
    stream: DataFrame,
    corpus_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """foreachBatch deduped corpus ingest: each arriving micro-batch is
    exact-deduped against itself AND the already-landed corpus
    (``incremental_dedup_exact`` — the corpus contributes only content
    digests, its text never moves), and only the survivors are APPENDED.

    This is the streaming write path of a training corpus: append-only
    (no history rewrite, unlike the SCD1 sink where values mutate),
    idempotent under re-delivery (a re-sent document matches its own
    digest and is dropped), and per-batch cost tracks the batch + one
    digest aggregate over the corpus — in production the digest table is
    maintained incrementally instead of re-aggregated.  Returns the
    started StreamingQuery.
    """
    from ..operators.dedup import incremental_dedup_exact

    spark = stream.sparkSession
    schema = stream.schema

    def ingest_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        corpus = read_or_empty(spark, corpus_path, schema)
        survivors = incremental_dedup_exact(
            corpus, batch_df, text_col=text_col, id_col=id_col
        )
        # append-only: no read-modify-write race with the corpus scan
        # above, because survivors are fully derived before the write and
        # new files never replace the ones the digest scan read
        survivors.localCheckpoint(eager=True).write.mode("append").parquet(
            corpus_path
        )

    writer = stream.writeStream.foreachBatch(ingest_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="15 seconds")
    return writer.start()


def fold_stats_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    agg_path: str,
    key_col: str = "event_type",
    value_col: str = "value",
) -> bool:
    """One effectively-once fold of a micro-batch into the stored per-key
    aggregate table (the foreachBatch body of ``incremental_stats_sink``,
    exposed so the replay guard is directly testable).  Returns True when
    the batch was applied, False when it was empty or already applied.
    """
    from ..operators.sketches import combine_aggregates

    agg_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("vmin", T.DoubleType()),
            T.StructField("vmax", T.DoubleType()),
            T.StructField("mean", T.DoubleType()),
            # the EXACT running sum — the fold input.  Folding from the 2dp
            # display `total` instead drifts ±0.005 per micro-batch, and the
            # error compounds silently over epochs.
            T.StructField("total_exact", T.DecimalType(30, 10)),
            T.StructField("__epoch", T.LongType()),
        ]
    )
    if not batch_df.take(1):
        return False
    snap = read_or_empty(spark, agg_path, agg_schema)
    last = snap.agg(F.max("__epoch")).first()[0]
    if last is not None and epoch_id <= last:
        return False
    # Legacy-snapshot migration: an aggregate table written before the
    # exact accumulator existed has no `total_exact` parquet column, so the
    # forced read schema materializes it as NULL for every key.  Folding
    # NULL would coalesce to 0 downstream and silently reset the running
    # total/mean while n keeps accumulating — fall back to the rounded
    # display `total` once (±0.005 one-time, vs. an unbounded reset), and
    # the next overwrite persists the exact column for all future folds.
    stored = snap.select(
        key_col,
        "n",
        F.coalesce(
            F.col("total_exact"), F.col("total").cast(T.DecimalType(30, 10))
        ).alias("total_exact"),
        "vmin",
        "vmax",
    )
    combined = combine_aggregates(
        stored, batch_df, key_col=key_col, value_col=value_col
    ).withColumn("__epoch", F.lit(epoch_id).cast("long"))
    combined.localCheckpoint(eager=True).write.mode("overwrite").parquet(agg_path)
    return True


def incremental_stats_sink(
    stream: DataFrame,
    agg_path: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    value_col: str = "value",
    available_now: bool = True,
):
    """foreachBatch aggregate-table maintenance: every micro-batch folds
    into a stored per-key (n, total, vmin, vmax, mean) table via
    ``sketches.combine_aggregates`` — the streaming twin of the batch
    operator, and the materialized-view pattern for plain parquet: the
    stored aggregate is the ONLY state, history facts are never re-read,
    and each batch's cost is batch-size + |keys|.

    localCheckpoint pins the combined snapshot before the overwrite (the
    same read-then-overwrite barrier the SCD1 sink uses — the lineage
    reads the files the write replaces).  Returns the StreamingQuery.

    foreachBatch is at-least-once: a micro-batch replayed after a failure
    between the parquet overwrite and the checkpoint commit would fold
    into the stored aggregate twice, permanently double-counting n/total.
    The last-applied ``__epoch`` rides in the aggregate table itself (one
    constant column, one tiny max() to read back — no extra state store),
    and batches with ``epoch_id <= last`` are skipped, making the fold
    effectively-once.
    """
    spark = stream.sparkSession

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        fold_stats_batch(
            spark, batch_df, epoch_id, agg_path, key_col=key_col, value_col=value_col
        )

    writer = stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="15 seconds")
    return writer.start()


def enrich_stream_to_parquet(
    stream: DataFrame,
    dim_path: str,
    on: str,
    target_path: str,
    checkpoint_path: str,
):
    """Stream-static enrichment with PER-BATCH dimension refresh: each
    micro-batch re-reads the dimension parquet inside ``foreachBatch`` and
    broadcast-joins it, so a slowly-changing dim updated between batches
    enriches the NEXT batch with current attributes — the property a
    plain stream-static join only gives you by accident of file listing,
    made explicit and testable here.

    Left join: stream rows with no dim match flow through with NULL
    attributes (an enrichment must never drop facts).

    Delivery semantics: foreachBatch is AT-LEAST-ONCE — a batch replayed
    after a failure between the write and the checkpoint commit runs
    again.  A blind append would duplicate fact rows on replay (the
    hazard ``incremental_scd1`` avoids only because its merge is
    idempotent by key), so each epoch writes its own ``__epoch=N``
    partition with DYNAMIC partition overwrite: a replay of epoch N
    rewrites exactly that partition and touches nothing else, making the
    sink idempotent per epoch = effectively-once end to end.  Readers of
    ``target_path`` see ``__epoch`` as an ordinary partition column.

    100 TB: the dim re-read is per-BATCH, not per-row; broadcast keeps
    the join shuffle-free so stream throughput is scan-bound, and the
    per-epoch overwrite replaces one partition directory, never the
    table.
    """

    def _enrich(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        dim = spark.read.parquet(dim_path)
        out = batch_df.join(F.broadcast(dim), on, "left")
        (
            out.withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(target_path)
        )

    return (
        stream.writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _read_epoch_sink(spark: SparkSession, target_path: str) -> DataFrame:
    """Read an :func:`enrich_stream_to_parquet` target with schema merge on:
    after the first compaction the base partition carries the
    ``__folded_upto`` bookkeeping column while stream-written epoch
    directories do not, so the unified schema needs the footer merge
    (epoch rows surface it as NULL)."""
    return spark.read.option("mergeSchema", "true").parquet(target_path)


def _folded_upto(df: DataFrame) -> int:
    """Highest epoch already folded into the base partition, -1 if never
    compacted.  Every base row carries the same ``__folded_upto`` value
    (the fold rewrites the whole base each compaction), so one
    column-pruned ``take(1)`` on the base partition answers it."""
    if "__folded_upto" not in df.columns:
        return -1
    row = (
        df.filter(F.col("__epoch") == -1).select("__folded_upto").take(1)
    )
    return int(row[0][0]) if row and row[0][0] is not None else -1


def enriched_read_view(spark: SparkSession, target_path: str) -> DataFrame:
    """Reader view of the per-epoch enrichment sink: the ``__epoch``
    partition column is write-side bookkeeping (it exists so a replayed
    micro-batch overwrites exactly its own partition), not data — consumers
    read through this view and never see it.  Identical rows before and
    after :func:`compact_enriched_epochs`.

    Crash safety (ADVICE r6): the view also filters out any
    ``__epoch=N`` directory with ``N <= __folded_upto`` — a leftover from
    a compaction that died after the base overwrite committed but before
    the directory deletes ran.  The base's own rows say which epochs are
    already folded (the fold records it atomically in the same overwrite
    that folds the rows), so duplicates never surface, even mid-crash.
    """
    df = _read_epoch_sink(spark, target_path)
    upto = _folded_upto(df)
    if upto >= 0:
        df = df.filter((F.col("__epoch") == -1) | (F.col("__epoch") > upto))
    return df.drop("__epoch", "__folded_upto")


def compact_enriched_epochs(
    spark: SparkSession,
    target_path: str,
    upto_epoch: int,
    _fault=None,
    reduce_fn=None,
) -> bool:
    """Fold every ``__epoch <= upto_epoch`` partition of an
    :func:`enrich_stream_to_parquet` target into the single base
    partition ``__epoch = -1`` — the small-file bound: without
    compaction the sink grows one directory per epoch forever; with it,
    live state is (base + epochs newer than the watermark).

    ``upto_epoch`` MUST trail the stream's committed-checkpoint horizon:
    the per-epoch overwrite is what makes a REPLAYED epoch idempotent, so
    compacting an epoch that can still replay would let the replay append
    a fresh ``__epoch=N`` directory alongside the already-folded rows.
    Epochs whose commit is recorded in the checkpoint can never replay —
    compact those.

    Crash safety (ADVICE r6): the fold stamps ``__folded_upto =
    upto_epoch`` into every base row, so the SAME atomic job commit that
    folds the rows also records which epochs they came from — there is no
    window where folded rows exist without the record (a manifest file
    written before or after the overwrite would leave one).  If a prior
    run died between its overwrite and its directory deletes, the
    leftover ``__epoch=N <= __folded_upto`` directories are (a) invisible
    to :func:`enriched_read_view` and (b) deleted — never re-folded — by
    the healing pass at the start of the next run, so a rerun converges
    instead of folding the duplicate copy in permanently.

    The fold localCheckpoints the combined rows BEFORE touching files
    (the same read-then-overwrite barrier every fold sink here uses),
    rewrites the base partition via dynamic partition overwrite, then
    drops the folded epoch directories through the Hadoop FileSystem API
    (works on any Spark-supported filesystem, not just local disk).
    Returns True when anything was compacted or healed.

    ``_fault`` is a test-only fault-injection hook (VERDICT r7 #6):
    called with a step label after every state transition — each healing
    delete, the staging checkpoint, the base overwrite commit, each
    folded-directory delete — so the crash-point sweep in
    ``tests/test_compaction_crash_sweep.py`` can kill the compaction
    between every pair of steps and prove reader idempotence plus rerun
    convergence at every point.  Production callers leave it None.
    """
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(target_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())

    def _step(label: str) -> None:
        if _fault is not None:
            _fault(label)

    def _drop_epoch_dirs(upto: int, phase: str) -> bool:
        dropped = False
        # deterministic delete order so the fault sweep's step sequence
        # is reproducible across runs
        for st in sorted(fs.listStatus(root), key=lambda s: s.getPath().getName()):
            name = st.getPath().getName()
            if not name.startswith("__epoch="):
                continue
            try:
                epoch = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if 0 <= epoch <= upto:
                fs.delete(st.getPath(), True)
                dropped = True
                _step(f"{phase}:{name}")
        return dropped

    already = _folded_upto(_read_epoch_sink(spark, target_path))
    _step("read_horizon")
    # healing pass: epoch dirs at or below the base's recorded fold
    # horizon are leftovers of a crashed delete phase — their rows are
    # already in the base, so delete, never re-fold
    healed = _drop_epoch_dirs(already, "heal")

    df = _read_epoch_sink(spark, target_path)
    old = df.filter(F.col("__epoch") <= upto_epoch)
    if not old.take(1):
        return healed
    new_upto = max(upto_epoch, already)
    if reduce_fn is not None:
        # pre-reduce the fold (``reduce_fn`` must be associative,
        # commutative, and idempotent over row sets — e.g. the curation
        # sink's min-id-per-fingerprint): base rows and epoch rows merge
        # under the same fold the read view applies, so compaction
        # changes bytes on disk, never reader-visible rows
        old = reduce_fn(old.drop("__epoch", "__folded_upto"))
    folded = (
        old.withColumn("__epoch", F.lit(-1).cast("int"))
        .withColumn("__folded_upto", F.lit(new_upto).cast("int"))
        .localCheckpoint(eager=True)
    )
    _step("staged")
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__epoch")
        .parquet(target_path)
    )
    _step("overwritten")
    _drop_epoch_dirs(upto_epoch, "drop")
    _step("done")
    return True


def incremental_join_view(
    spark,
    left_delta: DataFrame,
    left_path: str,
    right_path: str,
    out_path: str,
    on: str,
):
    """Incremental JOIN-view maintenance (classic IVM delta rule) for a
    left-side append: given ΔL, the maintained inner-join view gains
    exactly ΔL ⋈ R — so the view updates by scanning ONLY the delta
    against the (broadcastable) right side, never recomputing L ⋈ R.
    The batch-equivalence proof lives in the tests: folding deltas one
    batch at a time equals the one-shot join of the full inputs.

    The delta is also appended to the left base table so subsequent
    right-side deltas (``incremental_join_view_right``) see it.
    """
    right = spark.read.parquet(right_path)
    delta_out = left_delta.join(F.broadcast(right), on, "inner")
    delta_out.write.mode("append").parquet(out_path)
    left_delta.write.mode("append").parquet(left_path)


def incremental_join_view_right(
    spark,
    right_delta: DataFrame,
    left_path: str,
    right_path: str,
    out_path: str,
    on: str,
):
    """Right-side append for :func:`incremental_join_view`: the view
    gains L ⋈ ΔR (the already-folded left base joined against the small
    delta, broadcast).  Together the two delta rules maintain
    L ⋈ R under appends to either side with per-batch work proportional
    to |Δ| · (join fan-out), the IVM property that makes a 100 TB
    materialized join keepable-fresh."""
    left = spark.read.parquet(left_path)
    delta_out = left.join(F.broadcast(right_delta), on, "inner")
    delta_out.write.mode("append").parquet(out_path)
    right_delta.write.mode("append").parquet(right_path)


def _curated_min_id_fold(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One application of the exact-dedup fold over a curated-sink frame:
    keep each ``__fp`` fingerprint's minimum-id row.  groupBy-min with
    ``min_by`` for the payload columns (map-side partial combine — never
    a window), so duplicates collapse before the exchange.  The fold is
    associative, commutative, and idempotent, which is what makes
    fold(epochs) == batch(union) under any batch boundaries, arrival
    order, replays, or partial compactions."""
    payload = [c for c in df.columns if c not in ("__fp", id_col)]
    return df.groupBy("__fp").agg(
        F.min(id_col).alias(id_col),
        *[F.min_by(c, F.col(id_col)).alias(c) for c in payload],
    )


def _bucket_min_fold(df: DataFrame) -> DataFrame:
    """One application of the near-dup fold over a band-bucket state
    frame: keep each LSH band bucket's minimum doc id (its *champion*).
    min-per-bucket is associative, commutative, and idempotent — the same
    algebra as the exact stage's min-id-per-fingerprint — so the folded
    champion table equals the one-shot batch champion table under any
    batch boundaries, arrival orders, replays, or partial compactions
    (VERDICT r9 #6)."""
    return df.groupBy("bucket").agg(F.min("min_id").alias("min_id"))


def curate_stream_to_parquet(
    stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    min_stopwords: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    neardup_bucket_path: str | None = None,
):
    """Incremental curation over the epoch sink (VERDICT r8 #7): the
    curation pipeline's quality + exact-dedup gates running CONTINUOUSLY
    via ``foreachBatch`` — the shape a real 100 TB training-data pipeline
    runs (documents arrive forever; curation cannot be a one-shot batch).

    Per micro-batch: the Gopher quality gate
    (``textstats.gopher_quality_flags`` — map-only and doc-local, so
    batch boundaries cannot change its verdicts) filters the batch, the
    survivors get their exact-dup fingerprint (``md5(norm_text)`` — the
    ``dedup_exact`` fingerprint), and a WITHIN-batch min-id pre-reduce
    bounds the partition before it lands in the batch's own
    ``__epoch=N`` directory (dynamic partition overwrite — a replayed
    batch rewrites exactly its own partition, making the at-least-once
    ``foreachBatch`` contract effectively-once; the
    ``enrich_stream_to_parquet`` sink discipline).

    CROSS-batch exact dedup is deliberately NOT in the batch: it is the
    FOLD.  min-id-per-fingerprint is associative, commutative, and
    idempotent, so :func:`curated_read_view` (read-time fold) and
    :func:`compact_curated_epochs` (storage fold) both converge to the
    one-shot batch answer ``dedup_exact(gate(corpus))`` — the
    fold-equals-batch proof is pinned in
    ``tests/test_incremental_curation.py``.

    100 TB: per-batch work is gate (map-only) + one fingerprint-grain
    partial aggregate over the BATCH, never the history; the history is
    touched only by compaction, which runs at the operator's own cadence
    behind the checkpoint horizon.

    ``neardup_bucket_path`` (round 10, VERDICT r9 #6) adds the NEAR-dup
    stage with incremental semantics: when set, each batch also lands its
    MinHash band-bucket champions — ``(bucket, min_id)`` over the batch's
    reduced rows (``operators.dedup.banded_minhash``; 32 perms, banded)
    — into a second epoch sink under the same dynamic-partition-overwrite
    replay discipline.  Cross-batch near-dup is again the FOLD
    (:func:`_bucket_min_fold`: min id per bucket), applied by
    :func:`curated_read_view` at read time and by
    :func:`compact_bucket_epochs` in storage.  Banding the REDUCED rows
    is lossless: a row removed by the within-batch exact pre-reduce has
    an identical-text twin with a smaller id in the same batch, hence
    identical buckets — every bucket minimum is preserved.
    """
    from ..functions.text import norm_text
    from ..operators.dedup import banded_minhash
    from ..operators.textstats import gopher_quality_flags

    def _curate(batch_df: DataFrame, epoch_id: int) -> None:
        # the gate is a pure per-row function of the text, so the flags
        # frame carries the payload columns through (``keep_cols``) and is
        # filtered directly — the previous shape computed flags on an id
        # projection and joined back, paying a per-batch exchange plus a
        # second scan of the batch (guide §2.4)
        flags = gopher_quality_flags(
            batch_df,
            id_col=id_col,
            text_col=text_col,
            keep_cols=(text_col, source_col),
        )
        gated = flags.filter(
            (F.col("flag_word_count") == 1)
            & (F.col("flag_mean_word_len") == 1)
            & (F.col("flag_alpha") == 1)
            & (F.col("n_stopwords") >= min_stopwords)
        ).select(
            F.col(id_col),
            F.col(text_col),
            F.col(source_col),
            F.md5(norm_text(text_col)).alias("__fp"),
        )
        reduced = _curated_min_id_fold(gated, id_col=id_col)
        if neardup_bucket_path is not None:
            # the banded pass reads the reduced rows twice (sink write +
            # champion write); pin them once so the gate + fingerprint
            # subtree runs a single time per batch
            reduced = reduced.localCheckpoint(eager=True)
            champs = _bucket_min_fold(
                banded_minhash(
                    reduced, id_col, text_col, include_sig=False
                ).select("bucket", F.col("id").alias("min_id"))
            )
            (
                champs.withColumn("__epoch", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__epoch")
                .parquet(neardup_bucket_path)
            )
        (
            reduced.withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(target_path)
        )

    return (
        stream.writeStream.foreachBatch(_curate)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def curated_read_view(
    spark: SparkSession,
    target_path: str,
    id_col: str = "doc_id",
    neardup_bucket_path: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Reader view of the curated sink: live rows (base + epochs newer
    than the base's fold horizon — the :func:`enriched_read_view` crash
    discipline) under one application of the min-id fold, so consumers
    always see exactly ``dedup_exact(gate(everything ingested so far))``
    no matter how much has been compacted.

    With ``neardup_bucket_path`` (VERDICT r9 #6) the view also applies
    the NEAR-dup gate: the folded band-bucket champion table says, for
    every LSH bucket, the smallest doc id ever seen in it; an exact-stage
    survivor stays iff NO bucket of its own signature holds a smaller
    champion (``min over its buckets of champion == own id`` — the doc is
    always its own bucket member, so the min can only expose a smaller
    colliding doc).  Survivor buckets are re-derived by one map-only
    ``banded_minhash`` pass over the survivors (signatures are a pure
    function of text), so the bucket sink stores only champion state —
    bucket-cardinality rows, never per-doc lists.  The view therefore
    equals the one-shot batch
    ``neardup_gate(dedup_exact(gate(corpus)))`` under any arrival order
    or compaction horizon — pinned in ``tests/test_incremental_neardup.py``.
    """
    from ..operators.dedup import banded_minhash

    df = _read_epoch_sink(spark, target_path)
    upto = _folded_upto(df)
    if upto >= 0:
        df = df.filter((F.col("__epoch") == -1) | (F.col("__epoch") > upto))
    df = df.drop("__epoch", "__folded_upto")
    surv = _curated_min_id_fold(df, id_col=id_col).drop("__fp")
    if neardup_bucket_path is None:
        return surv
    ch = _read_epoch_sink(spark, neardup_bucket_path)
    ch_upto = _folded_upto(ch)
    if ch_upto >= 0:
        ch = ch.filter((F.col("__epoch") == -1) | (F.col("__epoch") > ch_upto))
    champs = _bucket_min_fold(ch.drop("__epoch", "__folded_upto")).withColumnRenamed(
        "min_id", "__champ"
    )
    sb = banded_minhash(surv, id_col, text_col, include_sig=False).select(
        F.col("id").alias(id_col), "bucket"
    )
    keep = (
        sb.join(champs, "bucket")
        .groupBy(id_col)
        .agg(F.min("__champ").alias("__mc"))
        .filter(F.col("__mc") == F.col(id_col))
        .select(id_col)
    )
    return surv.join(keep, id_col)


def compact_bucket_epochs(
    spark: SparkSession, bucket_path: str, upto_epoch: int, _fault=None
) -> bool:
    """Fold band-bucket champion epochs ``<= upto_epoch`` into the base
    partition under :func:`_bucket_min_fold` — storage shrinks to one row
    per live bucket while reader-visible champions are invariant (the
    read view applies the same idempotent fold over any mix of reduced
    base and unreduced epochs).  Inherits the full
    :func:`compact_enriched_epochs` crash discipline."""
    return compact_enriched_epochs(
        spark, bucket_path, upto_epoch, _fault=_fault, reduce_fn=_bucket_min_fold
    )


def compact_curated_epochs(
    spark: SparkSession,
    target_path: str,
    upto_epoch: int,
    id_col: str = "doc_id",
    _fault=None,
) -> bool:
    """Fold curated epochs ``<= upto_epoch`` into the base partition WITH
    the min-id dedup applied (``reduce_fn`` pre-reduce): storage shrinks
    to one row per surviving fingerprint while reader-visible rows are
    invariant, because the read view applies the same idempotent fold
    over whatever mix of reduced base and unreduced epochs exists.  All
    of :func:`compact_enriched_epochs`'s crash discipline (atomic
    ``__folded_upto`` stamp, healing pass, idempotent rerun) applies
    unchanged."""
    return compact_enriched_epochs(
        spark,
        target_path,
        upto_epoch,
        _fault=_fault,
        reduce_fn=lambda d: _curated_min_id_fold(d, id_col=id_col),
    )
