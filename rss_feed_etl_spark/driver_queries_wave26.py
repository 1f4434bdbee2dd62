"""Driver-contract queries, wave 26: structural/statistical corpus scoring
— item-transition PageRank over the event stream, per-document shingle
novelty, per-source z-score normalization, session path mining, and a
mergeable HLL distinct rollup.

PageRank is the importance-sampling signal web-corpus builders use
(Common Crawl ships harmonic-centrality ranks for exactly this); the
others are the normalize/diversify/aggregate steps around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea
from .operators import graph, sketches, textstats

# --- item-transition PageRank ----------------------------------------------

_PR_ITERS, _PR_DAMP = 3, 0.85


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.transition_edges(td.load_table(spark, sf_dir, "events"))
    return graph.pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMP)


def _pagerank_sql() -> str:
    # fixed-iteration power method as chained CTEs — mirrors the Spark
    # plan's per-iteration join/aggregate/9dp-round exactly.
    iters = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""c{i} AS (SELECT dst AS node, sum(rank * p) AS inflow
       FROM {prev} JOIN tr ON {prev}.node = tr.src GROUP BY 1),
d{i} AS (SELECT coalesce(sum(rank), 0) AS dmass FROM {prev}
       WHERE node NOT IN (SELECT src FROM ow)),
r{i} AS (SELECT nodes.node,
              round({1.0 - _PR_DAMP} / n + {_PR_DAMP} * (coalesce(inflow, 0) + dmass / n), 9) AS rank
       FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node, nn, d{i})"""
        )
        prev = f"r{i}"
    return f"""
WITH e AS (SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
                  event_type AS dst FROM events),
ed AS (SELECT src, dst, count(*) AS weight FROM e WHERE src IS NOT NULL GROUP BY 1, 2),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
nn AS (SELECT count(*) AS n FROM nodes),
ow AS (SELECT src, sum(weight) AS outw FROM ed GROUP BY 1),
tr AS (SELECT src, dst, weight * 1.0 / outw AS p FROM ed JOIN ow USING (src)),
r0 AS (SELECT node, round(1.0 / n, 9) AS rank FROM nodes, nn),
{", ".join(iters)}
SELECT node, round(rank, 6) AS rank FROM {prev}
"""


_register("item_pagerank", _q_pagerank, _pagerank_sql())


# --- per-document shingle novelty ------------------------------------------


def _q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.shingle_novelty(
        td.load_table(spark, sf_dir, "documents"), k=3
    )


_register(
    "shingle_novelty_scores",
    _q_novelty,
    """
WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
           FROM documents),
occ AS (SELECT doc_id AS id, unnest(list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM t),
dfreq AS (SELECT shingle, count(DISTINCT id) AS df FROM occ GROUP BY 1)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
           AS novelty
FROM occ JOIN dfreq USING (shingle) GROUP BY 1
""",
)


# --- per-source z-score normalization + cut --------------------------------

_Z_CUT = 2.0


def _q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.grouped_zscore(
        td.load_table(spark, sf_dir, "documents"),
        group_col="source",
        value_col="n_chars",
        z_cut=_Z_CUT,
    )


_register(
    "source_zscore_keep",
    _q_zscore,
    f"""
WITH s AS (SELECT source, count(*) AS n,
                  sum(CAST(n_chars AS DOUBLE)) AS sm,
                  sum(CAST(n_chars AS DOUBLE) * n_chars) AS ss
           FROM documents GROUP BY 1),
st AS (SELECT source, round(sm / n, 9) AS mean,
              round(sqrt(greatest(ss / n - (sm / n) * (sm / n), 0)), 9) AS sd
       FROM s),
z AS (SELECT doc_id, documents.source, CAST(n_chars AS DOUBLE) AS n_chars,
             round((n_chars - mean) / nullif(sd, 0), 6) AS zscore
      FROM documents JOIN st ON documents.source = st.source)
SELECT * FROM z WHERE abs(zscore) <= {_Z_CUT}
""",
)


# --- session path mining ---------------------------------------------------


def _q_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.session_paths(td.load_table(spark, sf_dir, "events"), top=20)


_register(
    "session_paths_top",
    _q_paths,
    """
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           AS gap_us
  FROM events),
s AS (
  SELECT *, sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM g),
p AS (SELECT user_id, sess, string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM s GROUP BY 1, 2)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM p GROUP BY 1
ORDER BY n_sessions DESC, path ASC LIMIT 20
""",
)


# --- mergeable HLL distinct rollup (no exact SQL oracle: estimates are
# sketch-dependent; the pytest suite bounds them against exact counts) -------


def _q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.distinct_rollup_sketched(
        td.load_table(spark, sf_dir, "events")
    )


_register("approx_distinct_rollup", _q_hll_rollup, None)
