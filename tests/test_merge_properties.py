"""Property-based checks of the merge operators (SURVEY §5.2): random
batches/histories against an independent dict-based model of the reference
semantics, plus SCD2 structural invariants under batch sequences.

Example counts are small because each example runs Spark jobs; the value
alphabet deliberately includes '' and 'nan' (the reference's null-ish
sentinels) and overlapping keys.
"""

from hypothesis import given, settings, strategies as st

from rss_feed_etl_spark.operators.merges import merge_scd1, merge_scd2

KEYS = st.sampled_from(["k0", "k1", "k2", "k3", "k4"])
VALS = st.sampled_from(["a", "b", "", "nan", "x y"])
ROW = st.tuples(KEYS, VALS, VALS)  # (link, entry_title, notes)


def rows_strategy():
    return st.lists(ROW, min_size=0, max_size=8)


def dedup_keep_last(rows):
    out = {}
    for link, title, notes in rows:
        out[link] = (title, notes)
    return out


def model_scd1(batch, history):
    """Reference M1 model: new values win; blank-ish new notes inherit
    history's notes (scd1_manager.py:121-129)."""
    out = dict(history)
    for link, (title, notes) in batch.items():
        if link in history and (notes is None or notes.strip() in ("", "nan")):
            notes = history[link][1]
        out[link] = (title, notes)
    return out


@settings(max_examples=12, deadline=None)
@given(batch_rows=rows_strategy(), hist_rows=rows_strategy())
def test_scd1_matches_model(spark, batch_rows, hist_rows):
    schema = "link string, entry_title string, notes string"
    batch = dedup_keep_last(batch_rows)
    history = dedup_keep_last(hist_rows)
    bdf = spark.createDataFrame(
        [(k, t, n) for k, (t, n) in batch.items()], schema
    )
    hdf = spark.createDataFrame(
        [(k, t, n) for k, (t, n) in history.items()], schema
    )
    got = {
        r.link: (r.entry_title, r.notes) for r in merge_scd1(bdf, hdf).collect()
    }
    assert got == model_scd1(batch, history)


@settings(max_examples=8, deadline=None)
@given(batches=st.lists(rows_strategy(), min_size=1, max_size=3))
def test_scd2_invariants_under_batch_sequence(spark, batches):
    schema = "link string, entry_title string, notes string"
    scd2_schema = (
        schema
        + ", effective_start timestamp, effective_end timestamp, current_flag int"
    )
    history = spark.createDataFrame([], scd2_schema)
    for i, rows in enumerate(batches):
        batch = dedup_keep_last(rows)
        bdf = spark.createDataFrame(
            [(k, t, n) for k, (t, n) in batch.items()], schema
        )
        history = merge_scd2(
            bdf, history, as_of=f"2024-06-0{i + 1} 12:00:00"
        ).localCheckpoint(eager=True)

    rows = history.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.link, []).append(r)
    all_batch_keys = {k for rs in batches for k, _, _ in rs}
    assert set(by_key) <= all_batch_keys
    for link, versions in by_key.items():
        current = [r for r in versions if r.current_flag == 1]
        # ≤1 current row per key, and exactly the current rows are open-ended
        assert len(current) <= 1
        for r in versions:
            assert (r.effective_end is None) == (r.current_flag == 1)
        # versions tile time: sorted starts are non-decreasing and closed
        # versions end where they ended (no overlap of [start, end) spans)
        closed = sorted(
            (r for r in versions if r.current_flag == 0),
            key=lambda r: r.effective_start,
        )
        for a, b in zip(closed, closed[1:]):
            assert a.effective_end <= b.effective_start
        if current and closed:
            assert closed[-1].effective_end <= current[0].effective_start
