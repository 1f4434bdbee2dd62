"""Wave 86: association rules and distinctive terms."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics as ea
from rss_feed_etl_spark.operators import textstats


def _basket(rows, eid, u, day, items):
    for it in items:
        rows.append(Row(event_id=eid[0], user_id=u,
                        ts=dt.datetime(2024, 1, day), props='{"k": %d}' % it))
        eid[0] += 1


def test_association_rules_confidence_is_directional(spark):
    rows, eid = [], [0]
    # bread(1) appears in 10 baskets; butter(2) in 4, ALWAYS with bread;
    # milk(3) in 5 baskets, 1 with bread
    for d in range(1, 5):
        _basket(rows, eid, d, d, [1, 2])       # bread+butter x4
    for d in range(5, 10):
        _basket(rows, eid, d, d, [1])          # bread alone x5
    _basket(rows, eid, 10, 10, [1, 3])         # bread+milk
    for d in range(11, 15):
        _basket(rows, eid, d, d, [3])          # milk alone x4
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in ea.association_rules(
            spark.createDataFrame(rows), min_support=0.0, min_confidence=0.0
        ).collect()
    }
    # butter -> bread is certain; bread -> butter is only 40%
    assert out[("2", "1")]["confidence"] == 1.0
    assert out[("1", "2")]["confidence"] == 0.4
    # lift symmetric for a pair
    assert out[("2", "1")]["lift"] == out[("1", "2")]["lift"]
    # butter->bread lift: conf(1.0) / P(bread)=10/14
    assert abs(out[("2", "1")]["lift"] - round(1.0 / (10 / 14), 6)) < 1e-6
    assert out[("1", "3")]["n_both"] == 1


def test_association_rules_thresholds_prune(spark):
    rows, eid = [], [0]
    for d in range(1, 11):
        _basket(rows, eid, d, d, [1, 2])
    _basket(rows, eid, 20, 20, [1, 3])  # one rare pair
    out = ea.association_rules(
        spark.createDataFrame(rows), min_support=0.15, min_confidence=0.5
    ).collect()
    pairs = {(r["antecedent"], r["consequent"]) for r in out}
    assert ("1", "2") in pairs and ("2", "1") in pairs
    assert ("1", "3") not in pairs  # support 1/11 < 0.15


def test_distinctive_terms_surface_source_vocabulary(spark):
    rows = []
    i = 0
    # source A peppers 'quantum' everywhere; B prefers 'pasta'; shared filler
    for _ in range(20):
        rows.append(Row(doc_id=i, source="A",
                        text="the data report quantum quantum flux")); i += 1
        rows.append(Row(doc_id=i, source="B",
                        text="the data report pasta pasta sauce")); i += 1
    out = textstats.distinctive_terms_log_odds(
        spark.createDataFrame(rows), top_k=2, min_count=5
    ).collect()
    top = {(r["source"], r["term"]) for r in out}
    assert ("A", "quantum") in top and ("B", "pasta") in top
    # shared filler never tops the contrast
    assert ("A", "the") not in top and ("B", "data") not in top
    za = {r["term"]: r["z_log_odds"] for r in out if r["source"] == "A"}
    assert za["quantum"] == max(za.values())
