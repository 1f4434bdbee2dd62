"""Driver-contract queries, wave 24: language-model-side corpus tooling —
bigram LM perplexity with stupid backoff (the KenLM-shaped quality signal)
and BPE first-iteration merge-candidate mining (tokenizer-training prep).

The bigram LM trains on the even-doc_id half of the corpus and scores ALL
documents, so the backoff path genuinely fires (self-scoring would see
every bigram and never back off).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import textstats

# --- bigram LM log-perplexity ----------------------------------------------


def _q_bigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    model = docs.filter(F.col("doc_id") % 2 == 0)
    return textstats.bigram_logppl(docs, model=model)


_BIGS = (
    "SELECT doc_id AS id, unnest(list_transform(range(1, len(w)), "
    "i -> {{'a': w[i], 'b': w[i+1]}}), recursive := true) FROM t{flt}"
)

_register(
    "bigram_logppl",
    _q_bigram_logppl,
    f"""
WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
           FROM documents),
bigs AS ({_BIGS.format(flt="")}),
mbigs AS ({_BIGS.format(flt=" WHERE doc_id % 2 = 0")}),
c2 AS (SELECT a, b, count(*) AS n2 FROM mbigs GROUP BY 1, 2),
c1 AS (SELECT tok, count(*) AS n1
       FROM (SELECT unnest(w) AS tok FROM t WHERE doc_id % 2 = 0) GROUP BY 1),
tot AS (SELECT sum(n1) AS total, count(*) AS vocab FROM c1),
pbi AS (SELECT c2.a, c2.b, c2.n2 / c1.n1 AS pb FROM c2 JOIN c1 ON c2.a = c1.tok),
scored AS (
  SELECT bigs.id,
         round(-ln(CASE WHEN pbi.pb IS NOT NULL THEN pbi.pb
                        ELSE 0.4 * (coalesce(cb.n1, 0) + 1.0) / (total + vocab)
                   END), 9) AS nll
  FROM bigs LEFT JOIN pbi ON bigs.a = pbi.a AND bigs.b = pbi.b
            LEFT JOIN c1 cb ON bigs.b = cb.tok, tot)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(nll), 6) AS logppl
FROM scored GROUP BY id
""",
)


# --- BPE merge-candidate mining --------------------------------------------


def _q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.bpe_merge_candidates(
        td.load_table(spark, sf_dir, "documents"), top=50
    )


_register(
    "bpe_merge_candidates",
    _q_bpe_merges,
    """
WITH words AS (
  SELECT w, count(*) AS cnt FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
    FROM documents)
  WHERE w <> '' GROUP BY w),
prs AS (
  SELECT cnt, unnest(list_transform(range(1, len(c)),
                     i -> {'sym_a': c[i], 'sym_b': c[i+1]}),
                     recursive := true)
  FROM (SELECT cnt, string_split(w, '') AS c FROM words))
SELECT sym_a, sym_b, CAST(sum(cnt) AS BIGINT) AS freq
FROM prs GROUP BY 1, 2
ORDER BY freq DESC, sym_a ASC, sym_b ASC
LIMIT 50
""",
)
