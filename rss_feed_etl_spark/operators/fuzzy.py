"""Blocked fuzzy matching: edit-distance near-dup pairs within blocking
keys — the classic record-linkage / entity-resolution step (dedupe a
customer or vendor master by near-identical names).

The all-pairs edit-distance problem is quadratic; blocking makes it
Σ_blocks |block|², the same shape as every bucketed near-dup operator in
this package (minhash bands, simhash bands, embedding LSH cells).  The
block key is caller-chosen (name prefix, soundex, length bucket, ...);
``max_block`` drops degenerate blocks the same way ``max_bucket`` does in
the LSH paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def levenshtein_blocked_pairs(
    df: DataFrame,
    block: Column,
    id_col: str = "id",
    text_col: str = "name",
    max_dist: int = 1,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Pairs (id_a < id_b) within the same ``block`` whose ``text_col``
    values are within ``max_dist`` Levenshtein edits.

    Plan (the one-sided bucket shape, same as ``ngram_jaccard_pairs``):
    ONE groupBy(block) collecting (id, text) structs — the only shuffle —
    then JVM-side in-bucket pair expansion via array transforms and the
    built-in ``levenshtein`` on each candidate pair.  A two-sided
    self-join on block would shuffle the table twice and re-evaluate the
    block expression per side.  On Spark ≥ 3.5 the 3-arg
    ``levenshtein(l, r, threshold)`` bounds the DP band and is the drop-in
    upgrade if ``max_dist`` is small relative to string length.

    Returns (id_a, id_b, block, dist).
    """
    t = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt"), block.alias("block")
    )
    buckets = t.groupBy("block").agg(
        F.sort_array(F.collect_list(F.struct("id", "txt"))).alias("members")
    )
    buckets = buckets.filter(F.size("members") >= 2)
    if max_block is not None:
        buckets = buckets.filter(F.size("members") <= max_block)
    m = F.col("members")
    pair_structs = F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + 2, F.greatest(F.size(m) - i - 1, F.lit(0))),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["txt"].alias("ta"),
                    y["txt"].alias("tb"),
                ),
            ),
        )
    )
    return (
        buckets.select("block", F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            "block",
            F.levenshtein(F.col("p.ta"), F.col("p.tb")).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
