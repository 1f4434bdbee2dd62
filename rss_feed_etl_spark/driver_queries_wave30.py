"""Driver-contract queries, wave 30: training-export composition —
curriculum-ordered shards (difficulty from the unigram LM, layout from the
content-addressed shuffle) and time-decayed popularity ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .operators import eventanalytics as ea
from .operators import sampling, textstats

# --- curriculum shards (easy-first by unigram logppl) ----------------------

_CUR_SALT, _CUR_SHARDS = "epoch0", 8


def _q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    scores = textstats.unigram_logppl(docs).select("doc_id", "logppl")
    return sampling.curriculum_shards(
        scores, "logppl", salt=_CUR_SALT, n_shards=_CUR_SHARDS
    )


_CUR_SHARD_SQL = (
    _hexfold(f"('{_CUR_SALT}:shard:' || CAST(doc_id AS VARCHAR))")
    + f" % {_CUR_SHARDS}"
)

_register(
    "curriculum_shards",
    _q_curriculum,
    f"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tot AS (SELECT sum(n) AS total, count(*) AS vocab FROM counts),
scored AS (
  SELECT id, round(-ln((n + 1.0) / (total + vocab)), 9) AS nll
  FROM toks JOIN counts USING (tok), tot),
lp AS (SELECT id AS doc_id, round(avg(nll), 6) AS logppl FROM scored GROUP BY id),
sh AS (
  SELECT doc_id, logppl,
         {_CUR_SHARD_SQL} AS shard,
         md5('{_CUR_SALT}:ord:' || CAST(doc_id AS VARCHAR)) AS pri
  FROM lp)
SELECT doc_id, logppl, shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY logppl, pri, doc_id) AS BIGINT) AS pos
FROM sh
""",
)


# --- time-decayed popularity -----------------------------------------------

_HL_DAYS = 7.0


def _q_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.decayed_popularity(
        td.load_table(spark, sf_dir, "events"), half_life_days=_HL_DAYS
    )


_LAM = 0.6931471805599453 / _HL_DAYS

_register(
    "decayed_popularity",
    _q_decayed,
    f"""
WITH m AS (SELECT max(ts) AS mx FROM events),
e AS (SELECT CAST(json_extract(props, '$.k') AS INT) AS item,
             round(exp(-{_LAM} * (epoch_us(mx) - epoch_us(ts)) / 86400000000.0), 9)
               AS w
      FROM events, m)
SELECT item, CAST(count(*) AS BIGINT) AS n_events, round(sum(w), 6) AS score
FROM e GROUP BY 1
""",
)
