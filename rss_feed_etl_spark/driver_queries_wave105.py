"""Driver-contract queries, wave 105: video-level embeddings by temporal
mean pooling of per-frame features — the multimodal frame-sample →
encode → pool pipeline, end to end in-engine.

The codec stage is the documented deterministic stub (this environment
ships no ffmpeg/vision encoder — see operators/multimodal.py); the
Spark-side plumbing (Arrow mapInPandas explode, decimal-exact pooling,
bounded collects) is real and oracle-checked: the stub chains md5 over
hex strings precisely so DuckDB can replay the identical trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_wave3 import _media_df
from .operators import multimodal

_VP_EVERY_MS, _VP_DIM = 1000, 16

# byte j of a hex digest column hh, as SQL integer arithmetic (the
# column-index twin of wave 3's _hexbyte, which takes a literal index)
_BYTE_J = (
    "((position(substr(hh, 2*j + 1, 1) IN '0123456789abcdef') - 1) * 16"
    " + (position(substr(hh, 2*j + 2, 1) IN '0123456789abcdef') - 1))"
)


def _q_video_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.video_embedding_pool(
        _media_df(spark, sf_dir, "video"), every_ms=_VP_EVERY_MS, dim=_VP_DIM
    )


_register(
    "video_embedding_pool",
    _q_video_pool,
    f"""
WITH m AS (
  SELECT doc_id AS media_id, md5(text) AS h,
         CAST(greatest(((n_chars % 5000) + 500) // {_VP_EVERY_MS}, 1) AS INT) AS n
  FROM documents),
f AS (
  SELECT media_id, n, md5(h || ':' || CAST(i AS VARCHAR)) AS hh
  FROM m CROSS JOIN LATERAL (SELECT unnest(range(0, n)) AS i) fr),
v AS (
  SELECT media_id, n, j, round({_BYTE_J} / 255.0, 6) AS v
  FROM f CROSS JOIN (SELECT unnest(range(0, {_VP_DIM})) AS j) d),
p AS (
  SELECT media_id, j, CAST(max(n) AS INT) AS n,
         round(CAST(sum(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6)
             AS pv
  FROM v GROUP BY 1, 2)
SELECT media_id, max(n) AS n_frames,
       array_to_string(list_transform(list(pv ORDER BY j),
                                      x -> printf('%.6f', x)), ',') AS pooled
FROM p GROUP BY 1
""",
)
