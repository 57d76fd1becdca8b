"""Document chunking and sequence packing for training-data pipelines.

Two standard preprocessing shapes a 100 TB corpus pipeline needs between
"filtered documents" and "model input":

- ``chunk_documents``: RAG-style overlapping token windows per document —
  pure per-row array algebra (sequence + slice inside codegen), no
  shuffle, no Python; output cardinality ~ total_tokens / stride.
- ``pack_documents``: GPT-style concat-and-split packing — documents are
  concatenated in deterministic (shard, id) order and cut into
  fixed-budget context windows; a document whose token span crosses a cut
  straddles two packs (exactly how causal-LM training data is packed).
  The running token offset is a prefix sum per shard: one window over the
  shard partitioning, so parallelism = number of shards (use the natural
  corpus sharding — here the ``source`` column — and packing is
  embarrassingly parallel while staying deterministic; a single global
  order would serialize the scan, which is why per-shard is the scale
  shape).

Both are plain Spark SQL expressions end to end, so a DuckDB oracle can
replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from deeptime_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping windows of whitespace tokens.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final chunk is the remainder
    (possibly shorter), and every document yields at least one chunk.
    Returns (id, chunk_idx, n_chunk_tokens, chunk_text) where chunk_text
    is the space-rejoined token window. All codegen: split once,
    posexplode a sequence of chunk starts, slice + array_join.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != "")
    n = F.size(toks)
    # number of chunks: ceil(max(n - overlap, 1) / stride), min 1
    n_chunks = F.greatest(
        F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride)).cast("long"),
        F.lit(1),
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    out = df.select(
        F.col(id_col), toks.alias("_toks"), F.posexplode(starts).alias("chunk_idx", "_s")
    )
    piece = F.slice(F.col("_toks"), F.col("_s") + 1, chunk_tokens)
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_documents(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    docs_per_shard: int | None = None,
) -> DataFrame:
    """Concat-and-split sequence packing per shard.

    Within each shard (ordered by id), documents occupy the token span
    [offset, offset + n_tokens); context windows are the budget-sized cuts
    of the shard's concatenated token stream. Returns per document:
    (id, shard, n_tokens, tok_offset, pack_first, pack_last, straddles) —
    pack_first/pack_last are the window indices containing the document's
    first/last token (equal unless the document crosses a cut; empty
    documents get pack_last = pack_first).

    One window over the shard partitioning: the prefix sum is the only
    sequential dependency, and it is per shard — the scale knob is the
    shard count, not the corpus size. When the natural shards are too few
    for the cluster (parallelism == shard count), ``docs_per_shard``
    sub-shards each one deterministically by id range: shard becomes
    ``source#<doc_id div docs_per_shard>``, each virtual shard packs
    independently (offsets restart — packing is per-shard by definition),
    and parallelism scales with corpus size again.
    """
    n_tok = F.size(F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != ""))
    shard_expr = F.col(shard_col).cast("string")
    if docs_per_shard is not None:
        if docs_per_shard < 1:
            raise ValueError("docs_per_shard must be >= 1")
        shard_expr = F.concat_ws(
            "#",
            shard_expr,
            F.floor(F.col(id_col) / docs_per_shard).cast("string"),
        )
    w = Window.partitionBy("shard").orderBy(id_col)
    out = df.select(
        F.col(id_col), shard_expr.alias("shard"), n_tok.alias("n_tokens")
    ).withColumn(
        "tok_offset", F.coalesce(F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0))
    )
    pack_first = (F.col("tok_offset") / budget).cast("long")
    last_tok = F.col("tok_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    pack_last = (last_tok / budget).cast("long")
    return out.select(
        id_col,
        "shard",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("tok_offset").cast("long").alias("tok_offset"),
        pack_first.alias("pack_first"),
        pack_last.alias("pack_last"),
        (pack_first != pack_last).cast("long").alias("straddles"),
    )
