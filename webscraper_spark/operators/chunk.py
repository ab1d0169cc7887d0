"""Document chunking: fixed-token windows with overlap.

The step between a cleaned corpus and a training batch: long documents
are split into windows of at most `max_tokens` tokens, advancing by
`stride` tokens (stride < max_tokens leaves the standard max-stride
token overlap so no span is ever cut in half at every boundary — the
same windowing every published LLM data pipeline applies before
sequence packing). Sequence packing (operators/pack.py, L20) then bins
these chunks into fixed token budgets; chunking bounds the pieces,
packing fills the bins.

All native: tokenize once, compute the chunk count with integer ceil
arithmetic, explode a chunk-index sequence, slice per window. A slice
per window copies each token ceil(max_tokens/stride) times — that
factor is the overlap redundancy itself (output size, not an
implementation tax). Empty documents produce zero chunks. Chunk ids
and boundaries depend only on the token array, so the output is
partitioning-invariant and any engine replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webscraper_spark.operators.dedup import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_id, start_tok, n_chunk_toks, chunk_text) windows.

    chunk k covers tokens [k*stride, k*stride + max_tokens); the last
    chunk starts at the smallest k*stride reaching the tail, so every
    token lands in >= 1 chunk and no chunk is empty.
    """
    if not (1 <= stride <= max_tokens):
        raise ValueError("chunk_documents: need 1 <= stride <= max_tokens")
    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    n = F.size("_toks")
    # ceil((n - max_tokens) / stride) + 1 chunks for n > 0 (1 when n <= max)
    n_chunks = F.floor(
        (F.greatest(n - max_tokens, F.lit(0)) + (stride - 1)) / stride
    ).cast("long") + 1
    t = t.filter(n > 0).select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("_toks"), start + 1, max_tokens)
    return t.select(
        id_col,
        "chunk_id",
        start.alias("start_tok"),
        F.size(piece).cast("long").alias("n_chunk_toks"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
