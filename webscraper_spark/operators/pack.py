"""Pretraining-batch assembly operators: distributed sequence packing and
deterministic domain-mix sampling.

These are the two corpus→training-batch ops every LLM data pipeline runs
after curation/dedup (SURVEY §2.10 L20/L21); the reference has no analogue
(its pipeline ends at a CSV sheet), so these are beyond-reference scope like
the rest of the L-family.

Scale design
------------
Greedy sequence packing is inherently sequential, so the distributed idiom
is *pack within hash-shards*: every document is routed to one of
``n_shards`` shards by a content-free hash of its id, and the fixed-budget
running-sum packing runs independently per shard (one window partition ==
one shard == one executor-local sort). Parallelism is exactly ``n_shards``
— size it so a shard's documents fit one task (at 100 TB: n_shards in the
tens of thousands). No step is driver-side; nothing depends on row arrival
order (the in-shard order key is doc_id, not partition order), so results
are bit-stable at any parallelism.

Domain-mix sampling is the standard deterministic-hash Bernoulli thinning:
keep a document iff ``h60('mix:'||doc_id) % 1e6 < rate(source) * 1e6``.
Rates are a config-sized dict compiled to a literal CASE — no join, no RNG,
reproducible across engines (the DuckDB oracle replays the same md5-based
h60 arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from webscraper_spark.functions.text import token_count
from webscraper_spark.operators.dedup import h60

MIX_DENOM = 1_000_000


def pack_sequences(
    docs: DataFrame,
    context_len: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document to a (shard, pack_id) training pack.

    Packing rule (deterministic, engine-independent): within a shard,
    documents are laid end-to-end in ``id_col`` order; a document belongs to
    the pack its FIRST token lands in, i.e. ``pack_id = floor(tokens_before
    / context_len)`` where ``tokens_before`` is the running token total of
    all earlier docs in the shard. ``pack_offset`` is the position of the
    doc's first token inside its pack. Documents longer than ``context_len``
    simply span packs (the trainer's chunker splits them; the assignment
    stays well-defined).

    Returns one row per input doc:
    (doc_id, shard, pack_id, pack_offset, n_tokens).
    """
    shard = (h60(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))) % n_shards).alias("shard")
    base = docs.select(F.col(id_col), shard, token_count(F.col(text_col)).alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        F.floor(before / context_len).cast("long").alias("pack_id"),
        (before % context_len).cast("long").alias("pack_offset"),
        "n_tokens",
    )


def domain_mix_keep(id_col: Column, source_col: Column, rates: dict[str, float]) -> Column:
    """Boolean keep-column for deterministic domain-mix downsampling.

    ``rates`` maps source → keep probability in [0, 1]; unlisted sources
    keep everything. The decision hashes only the id (``'mix:'||id``), so a
    document's fate is independent of which sources are being rebalanced.
    """
    bucket = h60(F.concat(F.lit("mix:"), id_col.cast("string"))) % MIX_DENOM
    keep = F.lit(True)
    for src, rate in sorted(rates.items()):
        keep = F.when(source_col == src, bucket < int(rate * MIX_DENOM)).otherwise(keep)
    return keep


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Filter ``docs`` to the deterministic domain-mix sample."""
    return docs.filter(domain_mix_keep(F.col(id_col), F.col(source_col), rates))
