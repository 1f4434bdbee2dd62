"""Sequence packing: lay documents end-to-end into fixed-size training
sequences (token budget L per sequence) — the step between a curated
corpus and a token-batch dataloader.

Assignment is contiguous greedy packing over a content-addressed order:
documents are laid out by md5(salt:key), each document starts at the
running token offset, and a document belongs to the sequence where its
first token lands (consumers split stragglers at the boundary).  Because
the order is a pure function of the keys, re-running or repartitioning the
corpus reproduces the identical layout.

Scale shape — a distributed prefix sum, not a global window:
1. in-bucket cumulative sums over ``n_buckets`` hash buckets (window
   partitioned by bucket — every partition fits its slice);
2. per-bucket totals (n_buckets rows) get their own cumulative offset via
   a window over that TINY frame — the only single-partition step touches
   n_buckets rows, never the corpus;
3. bucket offsets broadcast-join back.
The result is bit-identical to one global window ordered by
(bucket, hash, key), which is what the DuckDB oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_bucket
from ..functions.text import tokens


def pack_sequences(
    df: DataFrame,
    token_col: str,
    key_col: str = "doc_id",
    seq_len: int = 2048,
    salt: str = "pack-v1",
    n_buckets: int = 1024,
) -> DataFrame:
    """Assign each document a (seq_id, seq_offset) slot in the packed
    token stream.  Output: key, n_tokens, seq_id, seq_offset."""
    h = md5_bucket(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string")))
    staged = df.select(
        F.col(key_col),
        F.col(token_col).cast("bigint").alias("n_tokens"),
        h.alias("__h"),
        (h % n_buckets).alias("__b"),
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(F.col("__h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = staged.withColumn("__cum", F.sum("n_tokens").over(w_in))

    totals = staged.groupBy("__b").agg(F.sum("n_tokens").alias("__btot"))
    w_b = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__btot").over(w_b), F.lit(0)).alias("__boff")
    )

    start = F.col("__boff") + F.col("__cum") - F.col("n_tokens")
    return (
        staged.join(F.broadcast(offsets), "__b")
        .select(
            key_col,
            "n_tokens",
            F.floor(start / seq_len).alias("seq_id"),
            (start % seq_len).alias("seq_offset"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 16,
    stride: int = 12,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (RAG-style
    chunking: window ``chunk_tokens`` wide, advancing by ``stride``, so
    consecutive chunks overlap by ``chunk_tokens - stride``).

    The final window is pulled back to end exactly at the last token, so
    every token is covered and no chunk except a short document's only
    chunk is narrower than the window.  All pure expressions: tokenize →
    compute start positions with ``sequence``+``transform`` → posexplode →
    ``slice``.  The explode multiplies rows by ~n_tokens/stride, which is
    the output's actual size — nothing is amplified beyond what is
    emitted.  Chunk content is emitted as (n_tokens, md5) — the engine-
    neutral content stamp; join back to the corpus for the text itself.
    """
    w, s = chunk_tokens, stride
    toks = tokens(text_col)
    n = F.size(toks)
    n_extra = F.ceil(F.greatest(n - w, F.lit(0)) / s).cast("int")
    starts = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_extra),
            lambda i: F.least(i * s + 1, F.greatest(n - w + 1, F.lit(1))),
        )
    )
    chunked = df.select(
        F.col(id_col), toks.alias("__toks"), F.posexplode(starts).alias("chunk_idx", "start")
    )
    chunk = F.slice("__toks", F.col("start"), w)
    return chunked.select(
        id_col,
        "chunk_idx",
        "start",
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )
