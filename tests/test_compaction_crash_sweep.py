"""Full crash-point sweep for the epoch-compaction invariant (VERDICT r7
#6): kill ``compact_enriched_epochs`` between EVERY pair of state
transitions — after the horizon read, after each healing delete, after
the staging checkpoint, after the base overwrite commit, after each
folded-directory delete — then assert, at every point, that

1. the reader view surfaces exactly the original rows (no duplicates,
   no losses), and
2. a clean recompaction converges: same rows, no directory at or below
   the fold horizon left behind.

The fixture (a three-epoch enrichment sink) is built ONCE by streaming
and snapshotted; each crash point replays against a fresh copy of the
snapshot so every sweep entry starts from the identical on-disk state.
Two scenarios run the sweep: a fresh sink, and a sink already carrying
crash leftovers (folded base + restored epoch dirs), which routes the
sweep through the healing deletes as well.
"""

import os
import shutil

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.streaming.incremental import (
    compact_enriched_epochs,
    enrich_stream_to_parquet,
    enriched_read_view,
)


class _SimulatedCrash(Exception):
    pass


def _build_sink(spark, root) -> str:
    """Three-epoch enrichment sink; returns the target path."""
    landing = os.path.join(root, "landing")
    dim_path = os.path.join(root, "dim")
    target = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    spark.createDataFrame(
        [Row(source="a", tier="bronze"), Row(source="b", tier="silver")]
    ).write.mode("overwrite").parquet(dim_path)
    for i, src in enumerate(["a", "b", "a"]):
        spark.createDataFrame([Row(doc_id=i, source=src)]).write.mode(
            "append"
        ).parquet(landing)
        stream = spark.readStream.schema("doc_id long, source string").parquet(
            landing
        )
        q = enrich_stream_to_parquet(stream, dim_path, "source", target, ckpt)
        q.awaitTermination(120)
    return target


def _rows(spark, target):
    return sorted(
        (r["doc_id"], r["source"], r["tier"])
        for r in enriched_read_view(spark, target).collect()
    )


@pytest.fixture(scope="module")
def sink_template(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("crash_sweep")
    target = _build_sink(spark, str(root))
    expected = _rows(spark, target)
    assert expected == [(0, "a", "bronze"), (1, "b", "silver"), (2, "a", "bronze")]

    # scenario B template: compact fully, then restore the folded epoch
    # dirs — the canonical "died between overwrite and deletes" leftover
    crashed = str(root / "crashed_template")
    shutil.copytree(target, crashed)
    assert compact_enriched_epochs(spark, crashed, upto_epoch=1)
    for d in ("__epoch=0", "__epoch=1"):
        shutil.copytree(os.path.join(target, d), os.path.join(crashed, d))
    return {"fresh": target, "leftover": crashed, "expected": expected}


def _count_steps(spark, template, tmp_path) -> list[str]:
    """Dry run against a scratch copy to enumerate the step labels."""
    scratch = str(tmp_path / "steps")
    shutil.copytree(template, scratch)
    steps: list[str] = []
    compact_enriched_epochs(spark, scratch, upto_epoch=1, _fault=steps.append)
    shutil.rmtree(scratch)
    return steps


@pytest.mark.parametrize("scenario", ["fresh", "leftover"])
def test_crash_at_every_step_is_reader_idempotent(
    spark, sink_template, tmp_path, scenario
):
    template = sink_template[scenario]
    expected = sink_template["expected"]
    steps = _count_steps(spark, template, tmp_path)
    assert steps[-1] == "done"
    if scenario == "fresh":
        assert "drop:__epoch=0" in steps and "drop:__epoch=1" in steps
    else:
        # the leftover scenario must route through the healing deletes
        assert "heal:__epoch=0" in steps and "heal:__epoch=1" in steps

    for kill_at in range(len(steps)):  # crash BEFORE completing step kill_at+1
        work = str(tmp_path / f"{scenario}_{kill_at}")
        shutil.copytree(template, work)

        calls = {"n": 0}

        def die(label, _k=kill_at):
            if calls["n"] == _k:
                raise _SimulatedCrash(label)
            calls["n"] += 1

        # every label raises when reached — the final "done" label fires
        # after all work, so that sweep entry is the crash-free control
        with pytest.raises(_SimulatedCrash):
            compact_enriched_epochs(spark, work, upto_epoch=1, _fault=die)

        # invariant 1: the reader never surfaces duplicates or losses,
        # no matter where the compaction died
        assert _rows(spark, work) == expected, f"{scenario} crash@{steps[kill_at]}"

        # invariant 2: a clean rerun converges — rows intact, nothing at
        # or below the fold horizon left on disk
        compact_enriched_epochs(spark, work, upto_epoch=1)
        assert _rows(spark, work) == expected, f"{scenario} recompact@{steps[kill_at]}"
        leftover = {
            d
            for d in os.listdir(work)
            if d.startswith("__epoch=") and d not in ("__epoch=-1", "__epoch=2")
        }
        assert not leftover, f"{scenario} crash@{steps[kill_at]}: {leftover}"
        shutil.rmtree(work)
