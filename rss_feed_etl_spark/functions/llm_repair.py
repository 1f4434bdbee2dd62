"""Malformed-LLM-response repair (reference F15/F16).

The reference's scoring pipeline receives free-text model output and
recovers structure with a layered JSON+regex repair
(run_ats_enrichment.py:784-859 for the batch path,
src/utils/ats_matcher.py:79-127 for the single-response path):

1. regex the ``job_number … match_percentage`` pairs straight out of the
   prose;
2. else slice the outermost JSON array, normalize single quotes → double,
   quote bare keys, strip ``%`` suffixes, ``json.loads``;
3. else regex the pairs out of the (still broken) JSON string;
4. single-response path: slice the outermost ``{…}``, parse, pull
   ``match_percentage`` (tolerating ``"85%"`` strings) and the skill
   lists; fallback concatenates every digit/dot in the text into one
   number; final fallback is 0.0.

Two implementations, same semantics:

- plain-Python (`repair_batch_percentages`, `parse_single_match`) for the
  executor-side client bridge in ``sources/llm_client.py`` — runs once per
  API response, off the hot path;
- Column expressions (`match_percentage_col`, `repaired_json_col`) for
  repairing a DataFrame COLUMN of raw responses at corpus scale — pure
  JVM ``regexp_extract``/``regexp_replace``/``from_json``, no UDF.  The
  regex subset avoids lookaround/backrefs so the DuckDB oracle
  (`llm_response_repair` query) interprets the patterns identically.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# "job_number: 1, match_percentage: 63%" and JSON-ish variants
# (run_ats_enrichment.py:790)
_PAIR_RE = re.compile(r"job_number\"?:?\s*(\d+)\D{0,20}?match_percentage\"?:?\s*(\d+)")


def _clean_json_array(raw: str) -> str | None:
    """Slice the outermost [...] and normalize the reference's three repair
    classes: single quotes, bare keys, % suffixes
    (run_ats_enrichment.py:809-819)."""
    start, end = raw.find("["), raw.rfind("]") + 1
    if start < 0 or end <= start:
        return None
    s = raw[start:end].replace("'", '"')
    s = re.sub(r"(\w+):", r'"\1":', s)
    s = re.sub(r":\s*(\d+)%", r": \1", s)
    return s


def repair_batch_percentages(content: str, n_jobs: int) -> list[float]:
    """Batch-response repair: one percentage per job (0.0 when the response
    never mentions it), mirroring run_ats_enrichment.py:784-859."""
    out = [0.0] * n_jobs
    raw = content or ""
    pairs = _PAIR_RE.findall(raw)
    if pairs:
        for num, pct in pairs:
            i = int(num) - 1
            if 0 <= i < n_jobs:
                out[i] = float(int(pct))
        return out
    cleaned = _clean_json_array(raw)
    if cleaned is not None:
        try:
            arr = json.loads(cleaned)
        except json.JSONDecodeError:
            for num, pct in _PAIR_RE.findall(cleaned):
                i = int(num) - 1
                if 0 <= i < n_jobs:
                    out[i] = float(int(pct))
            return out
        for i, item in enumerate(arr):
            if i >= n_jobs or not isinstance(item, dict):
                continue
            pct = item.get("match_percentage", 0)
            if isinstance(pct, str):
                try:
                    pct = float(pct.rstrip("%"))
                except ValueError:
                    pct = 0
            out[i] = float(pct)
    return out


def parse_single_match(content: str) -> tuple[float, list[str], list[str]]:
    """Single-response repair → (match_percentage, missing_skills,
    matched_skills), mirroring src/utils/ats_matcher.py:79-127 including
    its digits-concatenation fallback."""
    raw = content or ""
    m = re.search(r"\{.*\}", raw, re.DOTALL)
    if m:
        try:
            data = json.loads(m.group(0))
            pct = data.get("match_percentage", 0)
            if isinstance(pct, str):
                pct = float(pct.rstrip("%") or 0)
            missing = [
                str(s).strip()
                for s in data.get("missing_skills", [])
                if isinstance(s, (str, int, float)) and str(s).strip()
            ]
            matched = [
                str(s).strip()
                for s in data.get("matched_skills", [])
                if isinstance(s, (str, int, float)) and str(s).strip()
            ]
            return round(float(pct), 2), missing, matched
        except (json.JSONDecodeError, ValueError, TypeError):
            pass
    digits = "".join(c for c in raw if c.isdigit() or c == ".")
    try:
        return round(float(digits), 2), [], []
    except ValueError:
        return 0.0, [], []


# --- Column-expression path (corpus-scale, JVM-side) -------------------------

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("match_percentage", T.StringType()),
        T.StructField("missing_skills", T.ArrayType(T.StringType())),
        T.StructField("matched_skills", T.ArrayType(T.StringType())),
    ]
)


def repaired_json_col(col: Column | str) -> Column:
    """The reference's three textual repairs as one regexp_replace chain:
    single quotes → double, bare keys quoted, % suffixes stripped."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "'", '"')
    c = F.regexp_replace(c, r"(\w+):", '"$1":')
    return F.regexp_replace(c, r":\s*(\d+)%", ": $1")


def match_percentage_col(col: Column | str) -> Column:
    """Best-effort match percentage from a raw response column — layered
    like the reference: labeled pair regex, then a ``NN%`` mention, then
    NULL.  Pure regexp_extract (no lookaround), so a DuckDB oracle runs
    the identical patterns."""
    c = F.col(col) if isinstance(col, str) else col
    labeled = F.regexp_extract(c, r"match_percentage\"?:?\s*\"?(\d+)", 1)
    anywhere = F.regexp_extract(c, r"(\d+)\s*%", 1)
    first = F.when(labeled != "", labeled).otherwise(
        F.when(anywhere != "", anywhere)
    )
    v = first.cast("double")
    # guard the clamp: Spark's least() SKIPS nulls (least(100, NULL) = 100),
    # so clamping an unrecovered NULL would fabricate a 100% match
    return F.when(v.isNotNull(), F.least(F.lit(100.0), v))


def parse_match_response_col(col: Column | str) -> Column:
    """Full structured parse of a response column → struct(match_percentage
    double, missing_skills, matched_skills): textual repair, ``from_json``
    on the outermost {...}, percentage falling back to the regex ladder.
    Spark-only (from_json) — covered by pytest fixtures, not an oracle."""
    c = F.col(col) if isinstance(col, str) else col
    obj = F.regexp_extract(c, r"(\{[\s\S]*\})", 1)
    parsed = F.from_json(repaired_json_col(obj), MATCH_SCHEMA)
    pct = F.coalesce(
        F.regexp_replace(parsed["match_percentage"], "%", "").cast("double"),
        match_percentage_col(c),
        F.lit(0.0),
    )
    return F.struct(
        F.round(pct, 2).alias("match_percentage"),
        F.coalesce(parsed["missing_skills"], F.array()).alias("missing_skills"),
        F.coalesce(parsed["matched_skills"], F.array()).alias("matched_skills"),
    )
