"""Driver-contract queries, wave 148: cross-encoder-style reranking —
the retrieve-then-rerank serving shape (VERDICT r9 #8's named gap).

Stage 1 nominates ``k_first`` BM25 candidates per query in one corpus
pass; stage 2 scores ONLY those candidates with a pairwise
"cross-encoder" inside an Arrow ``mapInPandas`` closure (the
deterministic feature stub — this container ships no model runtimes; a
real CrossEncoder loads once per executor into the same closure) and
re-ranks.  The oracle replays both stages: the registered BM25 SQL
shape plus the stub's interaction features as DuckDB list expressions —
identical IEEE doubles end to end, rounded engine-side.

Reference anchor: src/utils/ats_matcher.py:20-37 scores (resume, job)
PAIRS with TF-IDF cosine after a cheap keyword prefilter — the same
two-stage pair-scoring shape, generalized to the reranker every
retrieval/RAG pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import retrieval

_CE_QUERIES = {
    "q_joins": ["hash", "join", "merge"],
    "q_scan": ["scan", "filter", "fast"],
    "q_vector": ["vector", "window"],
    "q_dup": ["dup"],  # single-term: exercises the bigram=0 branch
}
_CE_K_FIRST = 20
_CE_K_FINAL = 5


def _q_ce_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return retrieval.cross_encoder_rerank(
        docs, _CE_QUERIES, k_first=_CE_K_FIRST, k_final=_CE_K_FINAL
    )


def _ce_sql() -> str:
    from .driver_queries_corpus import _W
    from .operators.retrieval import BM25_B, BM25_K1

    all_terms = sorted({t for ts in _CE_QUERIES.values() for t in ts})
    terms_sql = ", ".join(f"'{t}'" for t in all_terms)
    incidence = ", ".join(
        f"('{q}', '{t}')" for q, ts in _CE_QUERIES.items() for t in ts
    )
    qlists = ", ".join(
        "('{}', [{}])".format(q, ", ".join(f"'{t}'" for t in ts))
        for q, ts in _CE_QUERIES.items()
    )
    k1, b = BM25_K1, BM25_B
    return f"""
WITH toks AS (SELECT doc_id, {_W} AS w FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM toks),
q(query_id, term) AS (VALUES {incidence}),
ql(query_id, qterms) AS (VALUES {qlists}),
ex AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks),
tf AS (SELECT doc_id, dl, term, count(*) AS tf
       FROM ex WHERE term IN ({terms_sql}) GROUP BY 1, 2, 3),
dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
scored AS (SELECT q.query_id, tf.doc_id,
                  round(sum(ln(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
                            * tf * ({k1} + 1)
                            / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))), 6)
                    AS score
           FROM tf JOIN dfreq USING (term) JOIN q USING (term) CROSS JOIN stats
           GROUP BY 1, 2),
ranked AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS bm25_rank
           FROM scored QUALIFY bm25_rank <= {_CE_K_FIRST}),
feats AS (
  SELECT r.query_id, r.doc_id, r.bm25_rank,
         list_distinct(ql.qterms) AS qd,
         list_distinct(list_transform(range(1, len(ql.qterms)),
                                      i -> ql.qterms[i] || ' ' || ql.qterms[i+1]))
           AS qb,
         list_transform(range(1, greatest(len(t.w) - 1, 0) + 1),
                        i -> t.w[i] || ' ' || t.w[i+1]) AS db,
         t.w AS w
  FROM ranked r JOIN toks t USING (doc_id) JOIN ql USING (query_id)),
sc AS (
  SELECT query_id, doc_id, bm25_rank,
         round(
           0.6 * (len(list_filter(qd, t -> list_contains(w, t))) * 1.0 / len(qd))
         + 0.25 * (CASE WHEN len(qb) > 0
                        THEN len(list_filter(qb, g -> list_contains(db, g)))
                             * 1.0 / len(qb)
                        ELSE 0.0 END)
         + 0.15 * coalesce(
             1.0 / list_min(list_filter(
                     list_transform(qd, tt -> list_position(w, tt)),
                     p -> p IS NOT NULL)),
             0.0),
         6) AS ce_score
  FROM feats)
SELECT query_id, doc_id, bm25_rank, ce_score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY ce_score DESC, bm25_rank ASC,
                                        doc_id ASC) AS INT) AS rank
FROM sc QUALIFY rank <= {_CE_K_FINAL}
"""


_register("cross_encoder_rerank", _q_ce_rerank, _ce_sql())
