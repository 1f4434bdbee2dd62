"""Driver-contract queries, wave 21: mixture temperature sampling and
leakage-safe splitting — the two corpus-curation steps between dedup and
export that plain hash splitting/sampling gets wrong.

``temperature_mixture_sample`` rates are structural-exact across engines
(integer counts → divide → sqrt → multiply, all correctly-rounded IEEE
ops); ``leakage_safe_split`` splits on the near-dup component label so a
duplicate cluster can never straddle the train/test boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _AUG_SQL, _aug_docs, _hexfold
from .operators import dedup, sampling

# --- temperature (α=0.5) mixture sampling ----------------------------------

_TEMP_SALT = "temp-v1"
_TEMP_BASE = 0.5
_TEMP_PREC = 1_000_000


def _q_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.temperature_mixture_sample(
        docs, group_col="source", base_rate=_TEMP_BASE, key_col="doc_id",
        salt=_TEMP_SALT, precision=_TEMP_PREC,
    )


_TEMP_BUCKET = (
    _hexfold(f"('{_TEMP_SALT}:' || CAST(doc_id AS VARCHAR))") + f" % {_TEMP_PREC}"
)
_register(
    "temperature_mixture_sample",
    _q_temperature,
    f"""
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
m AS (SELECT max(n) AS nmax FROM c),
r AS (SELECT source,
             least(1.0, {_TEMP_BASE} * sqrt(CAST(nmax AS DOUBLE) / n)) AS rate
      FROM c, m)
SELECT doc_id, source
FROM documents JOIN r USING (source)
WHERE {_TEMP_BUCKET} < rate * {_TEMP_PREC}
""",
)


# --- leakage-safe train/val/test split --------------------------------------

_LEAK_SALT = "leak-split-v1"
_LEAK_WEIGHTS = {"train": 80, "val": 10, "test": 10}


def _q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _aug_docs(spark, sf_dir).select("id")
    pairs = dedup.minhash_lsh_pairs(
        _aug_docs(spark, sf_dir), id_col="id", text_col="text", n=3, threshold=0.25
    )
    comp = dedup.neardup_components(pairs)
    return sampling.leakage_safe_split(
        docs, comp, key_col="id", weights=_LEAK_WEIGHTS, salt=_LEAK_SALT
    )


_LEAK_BUCKET = _hexfold(f"('{_LEAK_SALT}:' || CAST(lab AS VARCHAR))") + " % 100"
_register(
    "leakage_safe_split",
    _q_leakage_safe_split,
    f"""
WITH {_AUG_SQL},
comps AS (SELECT * FROM ({ORACLES["neardup_components"]})),
lab AS (
  SELECT aug.id AS id, coalesce(c.component_id, aug.id) AS lab
  FROM aug LEFT JOIN comps c ON aug.id = c.id)
SELECT id,
       CASE WHEN {_LEAK_BUCKET} < {_LEAK_WEIGHTS["train"]} THEN 'train'
            WHEN {_LEAK_BUCKET} < {_LEAK_WEIGHTS["train"] + _LEAK_WEIGHTS["val"]}
            THEN 'val'
            ELSE 'test' END AS split
FROM lab
""",
)
