"""Driver-contract queries, wave 25: corpus-hygiene operators — vocabulary
OOV-rate scoring, token-entropy quality, Zipf's-law fit, and C4-style
boilerplate span detection/removal.

These are the pre-tokenizer health checks a training-data pipeline runs on
every corpus snapshot: does a size-budgeted vocab cover the text, are
documents diverse or templated, does the term distribution still look like
natural language, and which repeated spans are boilerplate to strip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import textstats

_TOKS = (
    "SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), "
    "'\\s+')) AS tok FROM documents"
)

# --- OOV rate against a size-budgeted corpus vocab -------------------------

_OOV_MIN, _OOV_SIZE = 5, 20


def _q_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.oov_rate(
        td.load_table(spark, sf_dir, "documents"),
        min_count=_OOV_MIN,
        vocab_size=_OOV_SIZE,
    )


_register(
    "oov_rate_scores",
    _q_oov,
    f"""
WITH t AS (SELECT * FROM ({_TOKS}) WHERE tok <> ''),
c AS (SELECT tok, count(*) AS n FROM t GROUP BY 1 HAVING count(*) >= {_OOV_MIN}),
v AS (SELECT tok FROM c ORDER BY n DESC, tok ASC LIMIT {_OOV_SIZE})
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
           AS oov_rate
FROM t LEFT JOIN v ON t.tok = v.tok GROUP BY 1
""",
)


# --- per-document token entropy + type-token ratio -------------------------


def _q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_entropy(td.load_table(spark, sf_dir, "documents"))


_register(
    "token_entropy_scores",
    _q_entropy,
    f"""
WITH t AS (SELECT * FROM ({_TOKS}) WHERE tok <> ''),
tc AS (SELECT id, tok, count(*) AS n FROM t GROUP BY 1, 2),
d AS (SELECT id, CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             sum(round(n * ln(n), 9)) AS nlogn
      FROM tc GROUP BY 1)
SELECT id AS doc_id, n_tokens, n_types,
       round(ln(n_tokens) - nlogn / n_tokens, 6) AS entropy,
       round(n_types * 1.0 / n_tokens, 6) AS ttr
FROM d
""",
)


# --- corpus-level Zipf fit -------------------------------------------------

_ZIPF_TOP = 1000


def _q_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.zipf_fit(
        td.load_table(spark, sf_dir, "documents"), top=_ZIPF_TOP
    )


_register(
    "zipf_corpus_fit",
    _q_zipf,
    f"""
WITH t AS (SELECT * FROM ({_TOKS}) WHERE tok <> ''),
c AS (SELECT tok, count(*) AS n FROM t GROUP BY 1
      ORDER BY n DESC, tok ASC LIMIT {_ZIPF_TOP}),
r AS (SELECT row_number() OVER (ORDER BY n DESC, tok ASC) AS rank, n FROM c),
xy AS (SELECT round(ln(rank), 9) AS x, round(ln(n), 9) AS y FROM r),
a AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
SELECT CAST(k AS BIGINT) AS n_terms,
       round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
       round((sy - sx * ((k * sxy - sx * sy) / (k * sxx - sx * sx))) / k, 6)
           AS intercept
FROM a
""",
)


# --- boilerplate spans + removal -------------------------------------------

_BP_K, _BP_MIN_DOCS = 3, 5

_SHINGLES = (
    "SELECT doc_id AS id, unnest(list_transform(range(1, len(w) - 1), "
    "i -> {{'pos': i, 's': w[i] || ' ' || w[i+1] || ' ' || w[i+2]}}), "
    "recursive := true) FROM t"
)


def _q_hot_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.hot_shingles(
        td.load_table(spark, sf_dir, "documents"), k=_BP_K, min_docs=_BP_MIN_DOCS
    )


_register(
    "hot_shingle_spans",
    _q_hot_shingles,
    f"""
WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
           FROM documents),
sh AS ({_SHINGLES.format()})
SELECT s AS shingle, CAST(count(DISTINCT id) AS BIGINT) AS n_docs
FROM sh GROUP BY 1 HAVING count(DISTINCT id) >= {_BP_MIN_DOCS}
""",
)


def _q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.remove_boilerplate(
        td.load_table(spark, sf_dir, "documents"), k=_BP_K, min_docs=_BP_MIN_DOCS
    )


_register(
    "boilerplate_removed",
    _q_remove_boilerplate,
    f"""
WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
           FROM documents),
sh AS ({_SHINGLES.format()}),
hot AS (SELECT s FROM sh GROUP BY s
        HAVING count(DISTINCT id) >= {_BP_MIN_DOCS}),
starts AS (SELECT id, pos FROM sh JOIN hot USING (s)),
toks AS (SELECT doc_id AS id, unnest(w) AS tok,
                generate_subscripts(w, 1) AS p FROM t),
kept AS (SELECT toks.id, tok, p FROM toks
         WHERE NOT EXISTS (SELECT 1 FROM starts st
                           WHERE st.id = toks.id
                             AND st.pos <= toks.p
                             AND toks.p <= st.pos + {_BP_K - 1})),
agg AS (SELECT id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY 1)
SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
       CAST(len(t.w) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN agg ON agg.id = t.doc_id
""",
)
