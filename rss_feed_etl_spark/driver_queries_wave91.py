"""Wave-91 driver queries: per-arm funnel comparison with z-tests and
order-insensitive xor table checksums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .operators import eventanalytics as ea
from .operators import profiling

_FUNNEL = ["view", "click", "purchase"]
_W_SQL = (
    "(PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


def _q_funnel_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.funnel_ab_compare(td.load_table(spark, sf_dir, "events"), _FUNNEL)


def _funnel_ab_sql() -> str:
    levels = []
    prev_src = "events"
    for i, stage in enumerate(_FUNNEL):
        guard = f" AND s{i - 1} = 1" if i else ""
        levels.append(
            f"l{i} AS (SELECT *, max(CASE WHEN event_type = '{stage}'{guard} "
            f"THEN 1 ELSE 0 END) OVER {_W_SQL} AS s{i} FROM {prev_src})"
        )
        prev_src = f"l{i}"
    maxes = ", ".join(f"max(s{i}) AS s{i}" for i in range(len(_FUNNEL)))
    arm = f"({_code('CAST(user_id AS VARCHAR)')}) % 2"
    sums = ", ".join(
        f"CAST(sum(CASE WHEN arm = {a} THEN s{i} ELSE 0 END) AS BIGINT)"
        f" AS s{i}a{a}"
        for i in range(len(_FUNNEL))
        for a in (0, 1)
    )
    rows = []
    for i, s in enumerate(_FUNNEL):
        c0, c1 = f"CAST(s{i}a0 AS DOUBLE)", f"CAST(s{i}a1 AS DOUBLE)"
        n0, n1 = "CAST(u0 AS DOUBLE)", "CAST(u1 AS DOUBLE)"
        p0, p1 = f"({c0} / {n0})", f"({c1} / {n1})"
        pp = f"(({c0} + {c1}) / ({n0} + {n1}))"
        var = f"({pp} * (1.0 - {pp}) * (1.0 / {n0} + 1.0 / {n1}))"
        z = f"(CASE WHEN {var} > 0 THEN ({p1} - {p0}) / sqrt({var}) END)"

        rows.append(
            f"SELECT {i} AS stage_idx, '{s}' AS stage, "
            f"s{i}a0 AS n_arm0, s{i}a1 AS n_arm1, "
            f"round({p0}, 6) AS rate_arm0, round({p1}, 6) AS rate_arm1, "
            f"round({z}, 6) AS z_score FROM c"
        )
    return (
        "WITH " + ", ".join(levels)
        + f", per_user AS (SELECT user_id, {maxes} "
        f"FROM l{len(_FUNNEL) - 1} GROUP BY 1)"
        + f", pa AS (SELECT {arm} AS arm, * FROM per_user)"
        + ", c AS (SELECT "
        "CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS u0, "
        "CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS u1, "
        + sums + " FROM pa) "
        + " UNION ALL ".join(rows)
    )


_register("funnel_ab_compare", _q_funnel_ab, _funnel_ab_sql())


def _q_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.table_checksums(
        td.load_table(spark, sf_dir, "events"),
        td.load_table(spark, sf_dir, "documents"),
        td.load_table(spark, sf_dir, "lineitem"),
    )


def _hx(x: str) -> str:
    # md5-prefix -> bigint (same fold as functions.hashing.md5_bucket)
    return (
        f"list_reduce(list_transform(string_split(substr(md5({x}),1,15), ''), "
        f"c -> position(c IN '0123456789abcdef')-1), (a,b) -> a*16+b)"
    )


_register(
    "table_checksums",
    _q_checksums,
    f"""
SELECT 'events' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor({_hx("concat_ws('|', CAST(event_id AS VARCHAR), "
                         "CAST(user_id AS VARCHAR), event_type, "
                         "strftime(ts, '%Y-%m-%d %H:%M:%S'), "
                         "CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR))")})
            AS BIGINT) AS xor_checksum
FROM events
UNION ALL
SELECT 'documents', CAST(count(*) AS BIGINT),
       CAST(bit_xor({_hx("concat_ws('|', CAST(doc_id AS VARCHAR), lang, "
                         "source, CAST(n_chars AS VARCHAR), md5(text))")})
            AS BIGINT)
FROM documents
UNION ALL
SELECT 'lineitem', CAST(count(*) AS BIGINT),
       CAST(bit_xor({_hx("concat_ws('|', CAST(l_orderkey AS VARCHAR), "
                         "CAST(l_linenumber AS VARCHAR), "
                         "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), "
                         "CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS VARCHAR), "
                         "l_returnflag)")}) AS BIGINT)
FROM lineitem
""",
)
