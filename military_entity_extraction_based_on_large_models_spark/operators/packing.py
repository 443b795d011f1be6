"""Sequence packing: assign documents to fixed-token-budget training bins.

The "concatenate, then cut at bin boundaries" approximation used in LLM
data prep: documents are laid out in a deterministic order per shard, each
document's bin is the bin its START offset falls into, so bins fill to the
budget and overflow by at most one document's tokens (no document is ever
split — the deterministic, oracle-expressible variant of greedy packing).

Scale design: the running-offset window is PARTITIONED BY SHARD — a global
ordered window would serialize the whole corpus through one task.  Shards
are independent (each packs its own bins), which is exactly how production
packing works (per input shard/file); ``n_shards`` sizes parallelism, and
the shard key is any deterministic function of the document key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_documents(
    docs: DataFrame,
    bin_tokens: int = 2048,
    text_col: str = "content",
    order_col: str = "doc_sha",
    shard: Column | None = None,
    n_shards: int = 256,
    size_col: Column | None = None,
) -> DataFrame:
    """docs → docs + (shard, n_tokens, bin_id, bin_offset).

    ``bin_id`` is the token-budget bin within the shard; ``bin_offset`` the
    document's token start offset inside its shard's stream.  Default shard
    key is ``pmod(xxhash64(order_col), n_shards)``; pass an explicit
    ``shard`` column for oracle-reproducible arithmetic (the driver query
    uses ``doc_id % 8``).  ``size_col`` overrides the whitespace token count
    as the document's budget contribution — pass the learned-subword count
    (operators.bpe.bpe_token_stats' n_bpe_tokens) to pack by REAL tokenizer
    budgets, which is what the training job actually consumes.  One shuffle
    (the per-shard window sort).
    """
    if bin_tokens <= 0:
        raise ValueError("bin_tokens must be positive")
    shard_col = (
        shard
        if shard is not None
        else F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_shards))
    )
    sized = docs.withColumn("shard", shard_col).withColumn(
        "n_tokens",
        size_col if size_col is not None else token_count(F.col(text_col)),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        sized.withColumn(
            "bin_offset",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "bin_id", F.floor(F.col("bin_offset") / F.lit(bin_tokens)).cast("bigint")
        )
    )
