"""Driver-contract queries, wave 5: the corpus DECISION layer — composed
quality keep/drop gates and the near-dup drop list.

Waves 2-4 compute signals (stats, language, signatures, pair similarity);
these two queries are what a training-data pipeline actually acts on:
which documents pass the quality bar, and which near-duplicates to drop
in favor of a canonical survivor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _NTOK, _PRED, _SCORES, _STOPLIST, _aug_docs
from .operators import dedup, joins, textstats

# --- composed quality filter ---------------------------------------------

_MIN_TOKENS = 20
_MAX_PUNCT = 0.08
_MIN_STOP = 0.05


def _q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_filter(
        td.load_table(spark, sf_dir, "documents"),
        min_tokens=_MIN_TOKENS,
        max_punct_ratio=_MAX_PUNCT,
        min_stopword_ratio=_MIN_STOP,
        allowed_lang="en",
    )


_register(
    "corpus_quality_filter",
    _q_quality_filter,
    f"""
WITH t AS (
  SELECT doc_id, text,
         list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t)) AS toks
  FROM documents),
s AS (SELECT doc_id, text, {_SCORES} FROM t),
st AS (
  SELECT doc_id,
         {_NTOK} AS n_tokens,
         {_PRED} AS pred_lang,
         CASE WHEN length(text) > 0
              THEN (length(text) - length(regexp_replace(text, '[.!,?;:]', '', 'g')))
                   / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN {_NTOK} > 0
              THEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   t -> lower(t) IN ({_STOPLIST})))
                   / CAST({_NTOK} AS DOUBLE)
              ELSE 0.0 END AS stop_ratio
  FROM s),
r AS (
  SELECT doc_id, n_tokens, pred_lang,
         concat_ws(';',
           CASE WHEN n_tokens < {_MIN_TOKENS} THEN 'too_short' END,
           CASE WHEN punct_ratio > {_MAX_PUNCT} THEN 'too_much_punct' END,
           CASE WHEN stop_ratio < {_MIN_STOP} THEN 'low_stopword' END,
           CASE WHEN pred_lang <> 'en' THEN 'bad_lang' END) AS reasons
  FROM st)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, pred_lang, reasons,
       reasons = '' AS keep
FROM r
""",
)


# --- near-dup drop list ---------------------------------------------------


def _q_drop_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup.minhash_lsh_pairs(
        _aug_docs(spark, sf_dir), id_col="id", text_col="text", n=3, threshold=0.25
    )
    return dedup.neardup_drop_list(pairs)


# the pair set is exactly the minhash_lsh_neardup oracle; the drop list is
# a one-hop min-canonical aggregation over it
_register(
    "neardup_drop_list",
    _q_drop_list,
    f"""
WITH pairs AS ({ORACLES["minhash_lsh_neardup"]})
SELECT id_b AS id, min(id_a) AS canonical_id
FROM pairs GROUP BY id_b
""",
)


# --- within-doc repetition (Gopher gate) ----------------------------------


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.repetition_ratio(td.load_table(spark, sf_dir, "documents"))


_register(
    "repetition_ratio",
    _q_repetition,
    """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(w)-2, 1)+1),
                        i -> array_to_string(w[i:i+2], ' ')) AS grams
  FROM t)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_unique_grams,
       round(CASE WHEN len(grams) > 0
                  THEN 1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE)
                  ELSE 0.0 END, 6) AS repetition
FROM g
""",
)


# --- corpus-wide top terms ------------------------------------------------

_TOPK_TERMS = 20
_STOPLIST_SQL = _STOPLIST  # same lexicon both engines


def _q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.top_terms(
        td.load_table(spark, sf_dir, "documents"), k=_TOPK_TERMS
    )


# --- returned-item revenue (TPC-H Q10 shape) ------------------------------


def _q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table join-agg: lineitem ⋈ orders shuffle on the fact key after
    the returnflag filter pushes into the lineitem scan; customer and
    nation are dimensions and broadcast (`F.broadcast` hints — at 100 TB
    the only exchange is the orderkey co-shuffle + the final partial-agg
    on custkey); top-20 via orderBy+limit = TakeOrderedAndProject."""
    li = td.load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = td.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = F.broadcast(
        td.load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_nationkey"
        )
    )
    nat = F.broadcast(
        td.load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_register(
    "returned_revenue_topk",
    _q_returned_revenue,
    """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)


# --- interval (range) join ------------------------------------------------

_WINDOW_S = 1800  # purchases within 30 min after a click


def _q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    out = joins.interval_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        min_delta_s=0, max_delta_s=_WINDOW_S,
    )
    return out.select(
        "user_id",
        "click_id",
        F.col("r_purchase_id").alias("purchase_id"),
        (F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("ts"))).alias("delta_us"),
    )


_register(
    "click_purchase_window",
    _q_interval_join,
    f"""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND epoch_us(p.ts) - epoch_us(c.ts) <= {_WINDOW_S} * 1000000
""",
)


_register(
    "corpus_top_terms",
    _q_top_terms,
    f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_transform(string_split_regex(trim(text), '\\s+'),
                               t -> lower(t))) AS term
  FROM documents),
f AS (
  SELECT doc_id, term FROM toks
  WHERE length(term) >= 3 AND regexp_full_match(term, '[a-z]+')
    AND term NOT IN ({_STOPLIST_SQL}))
SELECT term,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM f GROUP BY term
ORDER BY n_occurrences DESC, term ASC
LIMIT {_TOPK_TERMS}
""",
)
