"""Wave-83 driver queries: language-ID entropy (code-switch audit) and
Spearman engagement-spend rank correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _PRED, _SCORES
from .operators import profiling, textstats
from .operators.textstats import LANG_PROFILES

_LANGS = list(LANG_PROFILES)


def _q_lang_ent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.langid_entropy(td.load_table(spark, sf_dir, "documents"))


_TT = " + ".join(f"score_{lang}" for lang in _LANGS)
_PTERM = "(CAST(score_{l} AS DOUBLE) / CAST(tt AS DOUBLE))"
_ENT = " + ".join(
    "CASE WHEN score_{l} > 0 THEN -({p} * ln({p})) ELSE 0.0 END".format(
        l=lang, p=_PTERM.format(l=lang)
    )
    for lang in _LANGS
)
_ARR = "list_sort([" + ", ".join(f"score_{lang}" for lang in _LANGS) + "])"

_register(
    "langid_entropy",
    _q_lang_ent,
    f"""
WITH t AS (
  SELECT doc_id,
         list_transform(string_split_regex(trim(text), '\\s+'),
                        t -> lower(t)) AS toks
  FROM documents),
s AS (SELECT doc_id, {_SCORES} FROM t),
e AS (
  SELECT doc_id, {_PRED} AS pred_lang,
         CAST({_TT} AS BIGINT) AS tt,
         {_ARR} AS arr,
         {", ".join(f"score_{lang}" for lang in _LANGS)}
  FROM s)
SELECT doc_id, pred_lang, tt AS n_hits,
       round({_ENT}, 6) AS entropy,
       round(CAST(arr[{len(_LANGS)}] - arr[{len(_LANGS) - 1}] AS DOUBLE)
             / CAST(tt AS DOUBLE), 6) AS margin
FROM e WHERE tt > 0
""",
)


def _q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.spearman_rank_corr(td.load_table(spark, sf_dir, "events"))


_RANK = (
    "SELECT v, CAST(2 * (sum(cnt) OVER (ORDER BY v "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt) + cnt + 1 "
    "AS BIGINT) AS {out} FROM {grid}"
)

_register(
    "spearman_rank_corr",
    _q_spearman,
    f"""
WITH per AS (
  SELECT user_id AS u, CAST(count(*) AS BIGINT) c,
         CAST(round(sum(CAST(value AS DECIMAL(30,10))), 0) AS BIGINT) d
  FROM events GROUP BY 1),
gx AS (SELECT c AS v, CAST(count(*) AS BIGINT) cnt FROM per GROUP BY 1),
gy AS (SELECT d AS v, CAST(count(*) AS BIGINT) cnt FROM per GROUP BY 1),
rx AS ({_RANK.format(out='rx', grid='gx')}),
ry AS ({_RANK.format(out='ry', grid='gy')}),
j AS (
  SELECT rx.rx, ry.ry FROM per
  JOIN rx ON per.c = rx.v JOIN ry ON per.d = ry.v),
a AS (
  SELECT CAST(count(*) AS BIGINT) n,
         CAST(sum(rx) AS BIGINT) sx, CAST(sum(ry) AS BIGINT) sy,
         CAST(sum(rx * rx) AS BIGINT) sxx, CAST(sum(ry * ry) AS BIGINT) syy,
         CAST(sum(rx * ry) AS BIGINT) sxy
  FROM j)
SELECT n AS n_units,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
FROM a
""",
)
