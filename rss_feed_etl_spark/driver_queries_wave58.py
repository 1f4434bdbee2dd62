"""Wave-58 driver queries: Gopher-style quality gates and repetition
metrics (Rae et al. 2021 §A1.1) — the heuristic curation pass LLM
pipelines run before any model-based scoring.  Both are oracle-checked at
doc grain on the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .operators import textstats


def _q_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.gopher_quality_flags(td.load_table(spark, sf_dir, "documents"))


_GOPHER_STOP_SQL = ", ".join(f"'{s}'" for s in textstats.GOPHER_STOPWORDS)
_register(
    "gopher_quality_flags",
    _q_gopher,
    rf"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
m AS (SELECT doc_id,
        len(w) AS n_words,
        list_sum(list_transform(w, t -> length(t))) AS sum_len,
        len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha,
        len(list_distinct(list_intersect(list_transform(w, t -> lower(t)),
                                         [{_GOPHER_STOP_SQL}]))) AS n_stop
      FROM t)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(sum_len / CAST(n_words AS DOUBLE), 4) AS mean_word_len,
       round(n_alpha / CAST(n_words AS DOUBLE), 4) AS alpha_frac,
       CAST(n_stop AS BIGINT) AS n_stopwords,
       CAST(n_words BETWEEN 50 AND 100000 AS INT) AS flag_word_count,
       CAST(sum_len / CAST(n_words AS DOUBLE) BETWEEN 3 AND 10 AS INT) AS flag_mean_word_len,
       CAST(n_alpha / CAST(n_words AS DOUBLE) >= 0.8 AS INT) AS flag_alpha,
       CAST(n_stop >= 2 AS INT) AS flag_stopwords,
       CAST(n_words BETWEEN 50 AND 100000 AS INT)
         * CAST(sum_len / CAST(n_words AS DOUBLE) BETWEEN 3 AND 10 AS INT)
         * CAST(n_alpha / CAST(n_words AS DOUBLE) >= 0.8 AS INT)
         * CAST(n_stop >= 2 AS INT) AS keep
FROM m
""",
)


def _q_rep_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.repeated_ngram_stats(td.load_table(spark, sf_dir, "documents"))


# gram = base-31 polynomial of the n token codes (token_code = md5-prefix
# mod 1e9+7) — identical arithmetic to the Spark side's integer-code grams;
# intermediates stay < 3.3e10, exact bigint in both engines
_register(
    "repeated_ngram_stats",
    _q_rep_ngrams,
    rf"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
k AS (SELECT doc_id, len(w) AS nw,
             list_transform(w, x -> {_code('x')}) AS c
      FROM t WHERE len(w) >= 3),
g AS (SELECT doc_id,
             unnest(list_transform(range(1, nw - 1),
               i -> ((c[i] * 31 + c[i+1]) % 1000000007 * 31 + c[i+2]) % 1000000007)) AS gram
      FROM k),
cnts AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS total_ngrams,
       round((sum(cnt) - count(*)) / CAST(sum(cnt) AS DOUBLE), 4) AS dup_frac,
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 4) AS top_frac
FROM cnts GROUP BY 1
""",
)
