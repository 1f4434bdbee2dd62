"""Driver-contract queries, wave 50: grid-density (DBSCAN-style)
clustering over JL-projected embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import clustering
from .operators.similarity import _rp_sign_matrix

# --- grid density clusters --------------------------------------------------

_GD_DIM = 64
_GD_WIDTH = 0.5
_GD_MINPTS = 5


def _q_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering.grid_density_clusters(
        td.load_table(spark, sf_dir, "embeddings"),
        in_dim=_GD_DIM,
        cell_width=_GD_WIDTH,
        min_pts=_GD_MINPTS,
    )


def _grid_sql() -> str:
    signs = _rp_sign_matrix(_GD_DIM, 2)
    s0 = "[" + ", ".join(str(s) for s in signs[0]) + "]"
    s1 = "[" + ", ".join(str(s) for s in signs[1]) + "]"
    prj = (
        "CAST(floor(round(list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(embedding[i] AS DOUBLE) * {{s}}[i])) / sqrt(2.0), 6) "
        "/ {w}) AS BIGINT)"
    ).format(d=_GD_DIM, w=_GD_WIDTH)
    return f"""
WITH RECURSIVE sm AS (SELECT {s0} AS s0, {s1} AS s1),
p AS (SELECT vec_id,
             {prj.format(s='s0')} AS cx,
             {prj.format(s='s1')} AS cy
      FROM embeddings, sm),
pts AS (SELECT vec_id, cx, cy,
               (cx + 100000) * 1000000 + (cy + 100000) AS cell FROM p),
dense AS (SELECT cell, cx, cy, CAST(count(*) AS BIGINT) AS n
          FROM pts GROUP BY 1, 2, 3 HAVING count(*) >= {_GD_MINPTS}),
nb AS (SELECT d.cell,
              (d.cx + o.dx + 100000) * 1000000 + (d.cy + o.dy + 100000) AS ncell
       FROM dense d, (VALUES (1, -1), (1, 0), (1, 1), (0, 1)) o(dx, dy)),
e0 AS (SELECT least(nb.cell, nb.ncell) AS a, greatest(nb.cell, nb.ncell) AS b
       FROM nb JOIN dense dd ON dd.cell = nb.ncell),
edges AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(src, dst) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
comp AS (SELECT src AS cell, min(dst) AS cluster FROM reach GROUP BY 1),
cc AS (SELECT d.cell, coalesce(c.cluster, d.cell) AS cluster_id
       FROM dense d LEFT JOIN comp c ON d.cell = c.cell)
SELECT pts.vec_id, pts.cx, pts.cy, cc.cluster_id
FROM pts JOIN cc ON pts.cell = cc.cell
"""


_register("grid_density_clusters", _q_grid_clusters, _grid_sql())


# --- T5 span corruption -----------------------------------------------------

from .driver_queries_corpus import _hexfold  # noqa: E402
from .operators import packing  # noqa: E402

_SC_BLOCK = 3
_SC_PCT = 15
_SC_SALT = "t5-v1"


def _q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.span_corruption(
        td.load_table(spark, sf_dir, "documents"),
        block=_SC_BLOCK, mask_pct=_SC_PCT, salt=_SC_SALT,
    )


def _span_sql() -> str:
    h = _hexfold(
        f"('{_SC_SALT}:' || CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR))"
    )
    bt = f"array_to_string(w[b * {_SC_BLOCK} + 1 : (b + 1) * {_SC_BLOCK}], ' ')"
    sent = "'<extra_id_' || CAST(list_sum(rs[1 : b + 1]) - 1 AS VARCHAR) || '>'"
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w,
         CAST(ceil(len(string_split_regex(trim(text), '\\s+'))
                   / {_SC_BLOCK}.0) AS INT) AS nb
  FROM documents),
m AS (SELECT *, list_transform(range(nb),
        b -> CAST({h} % 100 < {_SC_PCT} AS INT)) AS mk FROM t),
r AS (SELECT *, list_transform(range(nb),
        b -> CAST(mk[b + 1] = 1 AND (b = 0 OR mk[b] = 0) AS INT)) AS rs FROM m),
parts AS (
  SELECT doc_id,
         CAST(list_sum(rs) AS BIGINT) AS n_spans,
         list_transform(range(nb),
           b -> CASE WHEN rs[b + 1] = 1 THEN {sent}
                     WHEN mk[b + 1] = 1 THEN ''
                     ELSE {bt} END) AS pin,
         list_transform(range(nb),
           b -> CASE WHEN rs[b + 1] = 1 THEN {sent} || ' ' || {bt}
                     WHEN mk[b + 1] = 1 THEN {bt}
                     ELSE '' END) AS ptg
  FROM r)
SELECT doc_id, n_spans,
       coalesce(array_to_string(list_filter(pin, x -> x <> ''), ' '), '') AS corrupted,
       coalesce(array_to_string(list_filter(ptg, x -> x <> ''), ' '), '') AS target
FROM parts
"""


_register("span_corruption", _q_span_corruption, _span_sql())
