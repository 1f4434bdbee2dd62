"""Driver-contract queries, wave 55: asymmetric containment dedup
(excerpt/subset duplicates) and per-source KL language divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _AUG_SQL, _SHINGLES, _W, _aug_docs, _code
from .operators import dedup, textstats

# --- containment pairs ------------------------------------------------------

_CT_THRESH = 0.8
_CT_MAXDF = 1000


def _q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_containment_pairs(
        _aug_docs(spark, sf_dir), id_col="id", text_col="text",
        n=3, threshold=_CT_THRESH, max_df=_CT_MAXDF,
    )


_register(
    "ngram_containment_pairs",
    _q_containment,
    f"""
WITH {_AUG_SQL},
sh AS (SELECT id, list_transform({_SHINGLES.format(w=_W)}, x -> {_code("x")}) AS s
       FROM aug),
ex AS (SELECT id, unnest(s) AS shingle FROM sh),
kept AS (SELECT shingle FROM ex GROUP BY shingle
         HAVING count(*) <= {_CT_MAXDF}),
exk AS (SELECT ex.id, ex.shingle FROM ex JOIN kept USING (shingle)),
sz AS (SELECT id, count(*) AS n FROM exk GROUP BY id),
p AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
      FROM exk a JOIN exk b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY 1, 2),
d AS (
  SELECT p.id_a AS src, p.id_b AS dst,
         round(common / CAST(sa.n AS DOUBLE), 6) AS containment
  FROM p JOIN sz sa ON sa.id = p.id_a
  UNION ALL
  SELECT p.id_b AS src, p.id_a AS dst,
         round(common / CAST(sb.n AS DOUBLE), 6) AS containment
  FROM p JOIN sz sb ON sb.id = p.id_b)
SELECT src, dst, containment FROM d WHERE containment >= {_CT_THRESH}
""",
)


# --- per-source KL divergence -----------------------------------------------

_KL_VOCAB = 200


def _q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.source_kl_divergence(
        td.load_table(spark, sf_dir, "documents"), vocab_size=_KL_VOCAB
    )


_KL_K = _KL_VOCAB + 1
_register(
    "source_kl_divergence",
    _q_source_kl,
    f"""
WITH tok AS (SELECT source AS g,
                    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
             FROM documents),
vc AS (SELECT term FROM (SELECT term, count(*) AS c FROM tok GROUP BY 1
                         ORDER BY c DESC, term ASC LIMIT {_KL_VOCAB})),
tagged AS (SELECT g, CASE WHEN term IN (SELECT term FROM vc)
                          THEN term ELSE '<oov>' END AS term
           FROM tok),
ps AS (SELECT g, term, count(*) AS sc FROM tagged GROUP BY 1, 2),
cp AS (SELECT term, sum(sc) AS cc FROM ps GROUP BY 1),
ts AS (SELECT g, sum(sc) AS st FROM ps GROUP BY 1),
tc AS (SELECT CAST(sum(cc) AS DOUBLE) AS ct FROM cp)
SELECT g AS source,
       round(sum(((sc + 0.5) / (st + 0.5 * {_KL_K}))
                 * ln(((sc + 0.5) / (st + 0.5 * {_KL_K}))
                      / ((cc + 0.5) / (ct + 0.5 * {_KL_K})))), 6) AS kl_bits_nat
FROM ps JOIN cp USING (term) JOIN ts USING (g), tc
GROUP BY 1
""",
)
