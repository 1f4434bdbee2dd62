"""Retrying LLM client + response repair (reference F15/F16).

Sequencing fixtures mirror run_ats_enrichment.py:219-286; repair fixtures
mirror the malformed responses the reference's recovery code handles
(run_ats_enrichment.py:784-859, src/utils/ats_matcher.py:79-127).
"""

from __future__ import annotations

import pytest

from rss_feed_etl_spark.functions.llm_repair import (
    match_percentage_col,
    parse_match_response_col,
    parse_single_match,
    repair_batch_percentages,
)
from rss_feed_etl_spark.sources.llm_client import (
    RetryingLLMClient,
    content_of,
    retrying_match_client_factory,
)

VALID = {"choices": [{"message": {"content": "ok"}}]}


class ScriptedTransport:
    """Yields scripted (status, headers, body) outcomes; an Exception entry
    raises (network failure)."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def __call__(self, request):
        self.calls += 1
        step = self.script.pop(0)
        if isinstance(step, Exception):
            raise step
        return step


def _client(script, **kw):
    sleeps = []
    t = ScriptedTransport(script)
    c = RetryingLLMClient(t, sleep=sleeps.append, **kw)
    return c, t, sleeps


def test_retry_backoff_sequencing_through_429():
    # network error -> retry_delay; 429 -> Retry-After honored; then success
    c, t, sleeps = _client(
        [ConnectionError("boom"), (429, {"Retry-After": "7"}, None), (200, {}, VALID)]
    )
    assert c.call([{"role": "user", "content": "hi"}], "m") == VALID
    assert t.calls == 3
    assert sleeps == [5.0, 7.0]


def test_429_without_retry_after_uses_retry_delay():
    c, t, sleeps = _client([(429, {}, None), (200, {}, VALID)], retry_delay=2.5)
    assert c.call([], "m") == VALID
    assert sleeps == [2.5]


def test_401_gives_up_immediately():
    c, t, sleeps = _client([(401, {}, None), (200, {}, VALID)])
    assert c.call([], "m") is None
    assert t.calls == 1 and sleeps == []


def test_malformed_200_retries():
    # 200 with missing choices, then 200 with undecodable body, then valid
    c, t, sleeps = _client(
        [(200, {}, {"error": "x"}), (200, {}, None), (200, {}, VALID)]
    )
    assert c.call([], "m") == VALID
    assert t.calls == 3 and sleeps == [5.0, 5.0]


def test_exhaustion_returns_none():
    c, t, sleeps = _client([(500, {}, None)] * 3, max_retries=3)
    assert c.call([], "m") is None
    assert t.calls == 3 and len(sleeps) == 3


def test_content_of_tolerates_garbage():
    assert content_of(VALID) == "ok"
    assert content_of(None) == ""
    assert content_of({"choices": []}) == ""


# --- repair: reference fixture cases -----------------------------------------


@pytest.mark.parametrize(
    "content,n,expected",
    [
        # prose pairs (run_ats_enrichment.py:790)
        ("job_number: 1, match_percentage: 63%\njob_number: 2, match_percentage: 40", 2, [63.0, 40.0]),
        # single-quoted pseudo-JSON with % values (repair path :809-819)
        ("[{'job_number': 1, 'match_percentage': 63%}, {'job_number': 2, 'match_percentage': 88%}]", 2, [63.0, 88.0]),
        # valid JSON with string "85%" values
        ('[{"match_percentage": "85%"}, {"match_percentage": 12}]', 2, [85.0, 12.0]),
        # array longer than the batch is truncated; shorter pads 0.0
        ('[{"match_percentage": 5}]', 2, [5.0, 0.0]),
        # nothing recoverable
        ("the model refused to answer", 2, [0.0, 0.0]),
    ],
)
def test_repair_batch_percentages(content, n, expected):
    assert repair_batch_percentages(content, n) == expected


def test_parse_single_match_json_with_skills():
    pct, missing, matched = parse_single_match(
        'Sure! {"match_percentage": "85%", "missing_skills": ["k8s", 2, "  "], '
        '"matched_skills": ["python"]} hope that helps'
    )
    assert pct == 85.0
    assert missing == ["k8s", "2"]
    assert matched == ["python"]


def test_parse_single_match_fallbacks():
    # digits-concatenation fallback (ats_matcher.py:101-105)
    assert parse_single_match("roughly 72.5 percent I'd say") == (72.5, [], [])
    assert parse_single_match("no idea") == (0.0, [], [])


def test_retrying_match_client_factory_end_to_end():
    """Flaky transport + batch repair through the ClientFactory bridge."""
    content = "job_number: 1, match_percentage: 63%\njob_number: 2, match_percentage: 40%"
    script = [
        (429, {"Retry-After": "1"}, None),
        (200, {}, {"choices": [{"message": {"content": content}}]}),
    ]
    sleeps = []
    factory = retrying_match_client_factory(
        lambda: ScriptedTransport(script), model="m", sleep=sleeps.append
    )
    out = factory()("resume text", ["job a", "job b"])
    assert out == [(63.0, [], []), (40.0, [], [])]
    assert sleeps == [1.0]


# --- Column-expression repair (Spark-side, from_json path) -------------------


def test_parse_match_response_col(spark):
    rows = [
        (1, 'Sure! {"match_percentage": "85%", "missing_skills": ["k8s"], "matched_skills": ["python"]}'),
        (2, "{'match_percentage': 63%}"),
        (3, "I think this is about a 42% match."),
        (4, "no numbers here"),
    ]
    df = spark.createDataFrame(rows, "id int, resp string")
    out = {
        r["id"]: r
        for r in df.select(
            "id", parse_match_response_col("resp").alias("p")
        ).select("id", "p.*").collect()
    }
    assert out[1]["match_percentage"] == 85.0
    assert out[1]["missing_skills"] == ["k8s"]
    assert out[1]["matched_skills"] == ["python"]
    assert out[2]["match_percentage"] == 63.0
    assert out[3]["match_percentage"] == 42.0
    assert out[4]["match_percentage"] == 0.0
    pcts = {
        r["id"]: r["pct"]
        for r in df.select(
            "id", match_percentage_col("resp").alias("pct")
        ).collect()
    }
    assert pcts[3] == 42.0 and pcts[4] is None
