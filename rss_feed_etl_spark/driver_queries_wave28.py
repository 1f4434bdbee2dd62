"""Driver-contract queries, wave 28: embedding dimensionality reduction
(Johnson-Lindenstrauss random projection) and exact global percent-rank
without a global fact sort.

The JL sign matrix is generated ONCE in Python (md5-derived ±1) and
embedded as literals in BOTH the Spark plan and the DuckDB oracle, so the
two engines share the exact matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import sketches, similarity

# --- JL random projection --------------------------------------------------

_IN_DIM, _OUT_DIM = 64, 16


def _q_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.random_projection(
        td.load_table(spark, sf_dir, "embeddings"),
        in_dim=_IN_DIM,
        out_dim=_OUT_DIM,
    )


def _rp_sql() -> str:
    signs = similarity._rp_sign_matrix(_IN_DIM, _OUT_DIM)
    rows = ", ".join(
        f"({j}, [{', '.join(str(s) for s in signs[j])}])"
        for j in range(_OUT_DIM)
    )
    return f"""
WITH m(dim, s) AS (VALUES {rows})
SELECT vec_id, CAST(dim AS BIGINT) AS dim,
       round(list_sum(list_transform(range(1, {_IN_DIM + 1}),
                      i -> CAST(embedding[i] AS DOUBLE) * s[i]))
             / sqrt({float(_OUT_DIM)}), 6) AS value
FROM embeddings, m
"""


_register("embedding_random_projection", _q_rp, _rp_sql())


# --- exact global percent rank ---------------------------------------------


def _q_pct_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.global_percent_rank(td.load_table(spark, sf_dir, "events"))


_register(
    "global_percent_rank",
    _q_pct_rank,
    """
SELECT event_id, round(value, 2) AS value,
       round(percent_rank() OVER (ORDER BY round(value, 2)), 6) AS pct_rank
FROM events
""",
)
