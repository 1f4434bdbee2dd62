"""Wave-86 driver queries: directional association rules over (user, day)
item baskets and distinctive terms per source via Dirichlet log-odds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea
from .operators import textstats

_MS = 0.0005
_MC = 0.03
_MAXB = 50


def _q_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.association_rules(
        td.load_table(spark, sf_dir, "events"),
        min_support=_MS, min_confidence=_MC, max_items_per_basket=_MAXB,
    )


_SUP = "(CAST(n_both AS DOUBLE) / CAST(n_baskets AS DOUBLE))"
_CONF = "(CAST(n_both AS DOUBLE) / CAST(n_a AS DOUBLE))"

_register(
    "association_rules",
    _q_rules,
    f"""
WITH it AS (
  SELECT DISTINCT user_id u, date_trunc('day', ts) dy,
         json_extract_string(props, '$.k') item
  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
sz AS (SELECT u, dy FROM it GROUP BY 1, 2 HAVING count(*) <= {_MAXB}),
itf AS (SELECT it.* FROM it JOIN sz ON it.u = sz.u AND it.dy = sz.dy),
nb AS (
  SELECT CAST(count(*) AS BIGINT) n_baskets
  FROM (SELECT DISTINCT u, dy FROM itf)),
ic AS (SELECT item, CAST(count(*) AS BIGINT) n_item FROM itf GROUP BY 1),
p AS (
  SELECT x.item antecedent, y.item consequent,
         CAST(count(*) AS BIGINT) n_both
  FROM itf x JOIN itf y ON x.u = y.u AND x.dy = y.dy AND x.item <> y.item
  GROUP BY 1, 2),
j AS (
  SELECT p.*, a.n_item n_a, b.n_item n_b, nb.n_baskets
  FROM p JOIN ic a ON p.antecedent = a.item
         JOIN ic b ON p.consequent = b.item, nb)
SELECT antecedent, consequent, n_both,
       round({_SUP}, 6) AS support,
       round({_CONF}, 6) AS confidence,
       round({_CONF} / (CAST(n_b AS DOUBLE) / CAST(n_baskets AS DOUBLE)), 6)
         AS lift
FROM j WHERE {_SUP} >= {_MS!r} AND {_CONF} >= {_MC!r}
""",
)

_TK = 5
_ALPHA = 0.01
_MINC = 5


def _q_distinctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.distinctive_terms_log_odds(
        td.load_table(spark, sf_dir, "documents"),
        top_k=_TK, alpha=_ALPHA, min_count=_MINC,
    )


_CS = "CAST(c AS DOUBLE)"
_NS = "CAST(ns AS DOUBLE)"
_CR = "CAST(ct - c AS DOUBLE)"
_NR = "(CAST(gtot AS DOUBLE) - CAST(ns AS DOUBLE))"
_AV = f"(CAST({_ALPHA!r} AS DOUBLE) * CAST(vocab AS DOUBLE))"
_A = f"CAST({_ALPHA!r} AS DOUBLE)"
_DELTA = (
    f"(ln(({_CS} + {_A}) / ({_NS} + {_AV} - {_CS} - {_A}))"
    f" - ln(({_CR} + {_A}) / ({_NR} + {_AV} - {_CR} - {_A})))"
)
_VAR = f"(1.0 / ({_CS} + {_A}) + 1.0 / ({_CR} + {_A}))"

_register(
    "distinctive_terms_log_odds",
    _q_distinctive,
    rf"""
WITH occ AS (
  SELECT source AS src, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents WHERE trim(text) <> ''),
st AS (SELECT src, term, CAST(count(*) AS BIGINT) c FROM occ GROUP BY 1, 2),
tot AS (SELECT src, CAST(sum(c) AS BIGINT) ns FROM st GROUP BY 1),
tt AS (SELECT term, CAST(sum(c) AS BIGINT) ct FROM st GROUP BY 1),
g AS (SELECT CAST(count(*) AS BIGINT) vocab, CAST(sum(ct) AS BIGINT) gtot
      FROM tt),
sc AS (
  SELECT st.src AS source, st.term, st.c AS n_source,
         round({_DELTA} / sqrt({_VAR}), 6) AS z_log_odds
  FROM st JOIN tot ON st.src = tot.src JOIN tt ON st.term = tt.term, g
  WHERE st.c >= {_MINC}),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source
    ORDER BY z_log_odds DESC, term ASC) AS rn
  FROM sc)
SELECT source, term, n_source, z_log_odds FROM r WHERE rn <= {_TK}
""",
)
