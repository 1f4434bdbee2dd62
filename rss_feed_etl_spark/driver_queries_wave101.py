"""Driver-contract queries, wave 101: greedy k-center diversity sampling —
the farthest-point coreset selector; the oracle replays the greedy
trajectory step by step (same unrolled-CTE pattern as k-means/MMR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_wave10 import _km_dist
from .operators import clustering

_KC_K = 5


def _q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering.kcenter_diversity_sample(
        td.load_table(spark, sf_dir, "embeddings"), k=_KC_K
    )


def _kc_steps() -> str:
    out = [
        """c1 AS (SELECT id, vec FROM emb ORDER BY id LIMIT 1),
d1 AS (
  SELECT e.id, e.vec, round({dist}, 6) AS md
  FROM emb e, c1 c WHERE e.id <> (SELECT id FROM c1))""".format(
            dist=_km_dist("e.vec", "c.vec")
        )
    ]
    for t in range(2, _KC_K + 1):
        prev = t - 1
        out.append(
            """c{t} AS (SELECT id, vec, md FROM d{prev} ORDER BY md DESC, id ASC LIMIT 1),
d{t} AS (
  SELECT d.id, d.vec, least(d.md, round({dist}, 6)) AS md
  FROM d{prev} d, c{t} c WHERE d.id <> (SELECT id FROM c{t}))""".format(
                t=t, prev=prev, dist=_km_dist("d.vec", "c.vec")
            )
        )
    return ",\n".join(out)


_KC_UNION = "\nUNION ALL\n".join(
    ["SELECT CAST(1 AS INT) AS rank, (SELECT id FROM c1) AS vec_id, CAST(0.0 AS DOUBLE) AS min_dist"]
    + [
        f"SELECT CAST({t} AS INT), (SELECT id FROM c{t}), (SELECT md FROM c{t})"
        for t in range(2, _KC_K + 1)
    ]
)

_register(
    "kcenter_diversity_sample",
    _q_kcenter,
    f"""
WITH emb AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
{_kc_steps()}
{_KC_UNION}
""",
)
