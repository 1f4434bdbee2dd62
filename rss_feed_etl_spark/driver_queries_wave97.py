"""Driver-contract queries, wave 97: per-dimension embedding normalization
stats (grid-exact, mergeable), character-class composition, and mixture
repeat-factor planning — the feature-preprocessing model, the char-level
junk gate, and the "how many epochs will each source repeat" budget table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .operators import profiling, sampling, textstats

# --- per-dimension embedding stats --------------------------------------------


def _q_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.embedding_dim_stats(td.load_table(spark, sf_dir, "embeddings"))


_QS = ",\n         ".join(
    f"min(CASE WHEN cum >= CAST(ceil({p} * n) AS BIGINT) THEN code END) / 10000.0 AS {name}"
    for p, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"))
)

_register(
    "embedding_dim_stats",
    _q_dim_stats,
    f"""
WITH comp AS (
  SELECT i - 1 AS pos,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS code
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
counts AS (SELECT pos, code, count(*) AS c FROM comp GROUP BY 1, 2),
st AS (
  SELECT pos, sum(c) AS n, sum(code * c) AS s1, sum(code * code * c) AS s2q
  FROM counts GROUP BY 1),
cum AS (
  SELECT pos, code,
         sum(c) OVER (PARTITION BY pos ORDER BY code
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts),
q AS (
  SELECT cum.pos,
         {_QS}
  FROM cum JOIN st USING (pos) GROUP BY 1),
m AS (
  SELECT pos, n,
         CAST(s1 AS DOUBLE) / n AS mc,
         CAST(s2q AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS vc
  FROM st)
SELECT CAST(m.pos AS INT) AS pos, CAST(n AS BIGINT) AS n,
       round(mc / 10000, 6) AS mean,
       CASE WHEN vc > 0 THEN round(sqrt(vc) / 10000, 6) ELSE 0.0 END AS std,
       p25, p50, p75
FROM m JOIN q USING (pos)
""",
)


# --- character-class mix -------------------------------------------------------


def _q_char_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.char_class_mix(td.load_table(spark, sf_dir, "documents"))


_CLASSES = [
    ("letter", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("space", r"\s"),
    ("punct", "[.!,?;:]"),
]
_CNTS = ",\n         ".join(
    f"length(text) - length(regexp_replace(text, '{cls}', '', 'g')) AS {name}"
    for name, cls in _CLASSES
)
_RATIOS = ",\n       ".join(
    f"CASE WHEN n > 0 THEN round({name} / CAST(n AS DOUBLE), 4) ELSE 0.0 END AS {name}_ratio"
    for name, _ in _CLASSES
)

_register(
    "char_class_mix",
    _q_char_mix,
    rf"""
WITH t AS (
  SELECT doc_id, length(text) AS n,
         {_CNTS}
  FROM documents)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
       {_RATIOS},
       CASE WHEN n > 0
            THEN round((n - letter - digit - space - punct) / CAST(n AS DOUBLE), 4)
            ELSE 0.0 END AS other_ratio
FROM t
""",
)


# --- mixture repeat factors ----------------------------------------------------

_BUDGET = 1_000_000


def _q_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.mixture_repeat_factors(
        td.load_table(spark, sf_dir, "documents"), budget_tokens=_BUDGET
    )


_register(
    "mixture_repeat_factors",
    _q_repeat,
    rf"""
WITH w AS (
  SELECT source, lang, n_docs, cell_weight
  FROM ({ORACLES["ipf_source_lang_weights"]})),
toks AS (
  SELECT source, lang,
         CAST(sum(CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END)
              AS BIGINT) AS actual_tokens
  FROM documents GROUP BY 1, 2),
tot AS (
  SELECT CAST(sum(CAST(cell_weight AS DECIMAL(30,10))) AS DOUBLE) AS wtot FROM w)
SELECT w.source, w.lang, w.n_docs, toks.actual_tokens,
       round({_BUDGET}.0 * cell_weight / wtot, 2) AS expected_tokens,
       CASE WHEN actual_tokens > 0
            THEN round({_BUDGET}.0 * cell_weight / wtot / actual_tokens, 4)
            ELSE 0.0 END AS repeat_factor
FROM w JOIN toks USING (source, lang), tot
""",
)
