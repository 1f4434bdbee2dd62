"""Driver-contract queries, wave 53: star-join pre-flight advisor."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import profiling

# (dim name, table, fact key, dim key, string cols, fixed bytes of the rest)
_DIMS = [
    ("orders", "l_orderkey", "o_orderkey",
     ["o_orderstatus", "o_orderpriority"], 8 + 8 + 8 + 8),
    ("part", "l_partkey", "p_partkey",
     ["p_name", "p_brand", "p_type"], 8 + 4 + 8),
    ("supplier", "l_suppkey", "s_suppkey",
     ["s_name"], 8 + 4 + 8),
]
_BC_MB = 10.0


def _q_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = td.load_table(spark, sf_dir, "lineitem")
    dims = {
        name: (td.load_table(spark, sf_dir, name), fk, dk)
        for name, fk, dk, _, _ in _DIMS
    }
    return profiling.star_join_advisor(fact, dims, broadcast_threshold_mb=_BC_MB)


def _advisor_sql() -> str:
    arms = []
    for name, fk, dk, scols, fixed in _DIMS:
        width = " + ".join(
            [str(fixed)] + [f"coalesce(length({c}), 0)" for c in scols]
        )
        arms.append(f"""
SELECT '{name}' AS dim,
       (SELECT CAST(count(*) AS BIGINT) FROM {name}) AS n_rows,
       (SELECT round(avg({width}), 2) FROM {name}) AS est_row_bytes,
       round((SELECT count(*) FROM {name})
             * (SELECT round(avg({width}), 2) FROM {name}) / 1048576.0, 4)
         AS est_total_mb,
       CAST((SELECT count(*) FROM {name})
            * (SELECT round(avg({width}), 2) FROM {name})
            <= {_BC_MB} * 1048576.0 AS INT) AS broadcastable,
       round((SELECT CAST(count(*) AS DOUBLE) FROM lineitem
              WHERE {fk} IN (SELECT {dk} FROM {name}))
             / (SELECT count(*) FROM lineitem), 6) AS fk_match_rate
""")
    return " UNION ALL ".join(arms)


_register("star_join_advisor", _q_advisor, _advisor_sql())
