"""Rotation hygiene for the driver-sampled query window.

The driver checks the first ~50 names of ``queries()`` each round, so the
rotation lists in ``driver_queries.py`` decide which queries earn a
CORRECTNESS row.  These tests pin the invariants the round-4 judge asked
for (ADVICE r4: duplicate _PRIORITY entry silently displaced a
never-sampled name from the window).
"""

from __future__ import annotations

import json
import pathlib

from rss_feed_etl_spark import driver_queries as dq

REPO = pathlib.Path(__file__).resolve().parents[1]


def _sampled_names() -> set[str]:
    names: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        names.update(json.loads(path.read_text()).keys())
    return names


def test_priority_has_no_duplicates():
    assert len(dq._PRIORITY) == len(set(dq._PRIORITY))


def test_priority_and_green_disjoint():
    # A name in both lists would appear twice in the rotated order and
    # waste a window slot; changed-code queries must leave _GREEN_R01.
    overlap = set(dq._PRIORITY) & dq._GREEN_R01
    assert not overlap, f"names in both _PRIORITY and _GREEN_R01: {overlap}"


def test_green_set_only_contains_registered_names():
    registered = set(dq.queries().keys())
    stale = dq._GREEN_R01 - registered
    assert not stale, f"_GREEN_R01 names not registered: {stale}"


def test_readme_query_count_matches_registry():
    # the README's "N queries" line went stale two rounds running; pin it
    import re

    readme = (REPO / "README.md").read_text()
    m = re.search(r"\((\d+) queries;", readme)
    assert m, "README query-count line missing"
    assert int(m.group(1)) == len(dq.queries())


def test_window_leads_with_unsampled_or_changed_names():
    # The first 50 rotated names should all be either never driver-sampled
    # or explicitly listed in _PRIORITY (changed code that must re-verify).
    sampled = _sampled_names()
    if not sampled:  # fresh checkout without CORRECTNESS artifacts
        return
    first50 = list(dq.queries().keys())[:50]
    wasted = [n for n in first50 if n in sampled and n not in dq._PRIORITY]
    assert not wasted, f"window slots wasted on already-sampled names: {wasted}"
