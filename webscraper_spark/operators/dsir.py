r"""DSIR-style hashed n-gram importance weights, fixed-point integer.

Data Selection with Importance Resampling (Xie et al., 2023 — public
NeurIPS paper) scores every raw-corpus document by how target-like its
hashed n-gram distribution is: featurize docs into B hash buckets of
bigrams, fit bag-of-grams models over the target set and the raw set,
and weight each doc by the per-gram likelihood ratio. Used to pick
web-scale pretraining data that matches a curated target (e.g. keep the
most Wikipedia-like 10% of Common Crawl). The reference has nothing of
the sort; this is L34 in SURVEY §2.10.

Arithmetic discipline (the repo-wide rule — see operators/graph.py,
operators/lm.py): the paper's log-likelihood-ratio sum is a float whose
value depends on addition order, so this implementation keeps the
per-bucket ratio itself in fixed point and sums integers:

    w(b)     = ((cnt_t(b)+1) * (S+B) * Q) // ((cnt_s(b)+1) * (T+B))
    score(d) = sum over d's bigram occurrences of w(bucket(gram))

with T/S the total target/raw gram counts (add-one smoothing over B
buckets) and Q = 2^16 the fixed-point scale. Every op is integer
+,*,// on positive operands — associative and bit-identical in any
engine, so DuckDB replays the whole thing. A monotone surrogate of the
ratio-product (sum-of-ratios instead of sum-of-logs): documented
deviation, same selection ordering in the common regime where per-gram
ratios are near 1. BIGINT headroom: (T+1)*(S+B)*Q needs T*S < 2^47 —
holds to ~10^8 total grams per side; beyond that, compute w(b) in
DECIMAL(38) or drop Q to 2^8 (the weight table is B rows — tiny either
way).

Scale design: the gram stream is never collected — two map-side
combinable counts keyed on bucket (B buckets, so the weight table is
~thousands of rows however big the corpus is), one broadcast join of
grams->weights, one partial-agg sum per doc. The only scalars (T, S)
travel via a 1-row crossJoin, not the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webscraper_spark.operators.dedup import h60, tokens

Q_SCALE = 1 << 16


def bigrams(text_col: Column) -> Column:
    """Adjacent-token bigram array ('a b', 'b c', ...); docs with <2
    tokens get an empty array (score 0 by construction). zip_with
    construction via dedup.ngram_join — the per-index element_at form
    this replaced A/B-measured ~10x slower (see ngram_join)."""
    from webscraper_spark.operators.dedup import ngram_join

    return ngram_join(tokens(text_col), 2)


def importance_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    q_scale: int = Q_SCALE,
) -> DataFrame:
    """Per-doc fixed-point DSIR importance score.

    docs: the raw corpus; `is_target` marks the rows that double as the
    target sample (e.g. `F.col("lang") == "en"`). Returns
    (id_col, n_grams, score) — score is the integer sum of per-gram
    bucket weights; higher = more target-like.
    """
    grams = docs.select(
        F.col(id_col),
        is_target.cast("long").alias("is_t"),
        F.explode(bigrams(F.col(text_col))).alias("gram"),
    ).withColumn("bucket", h60(F.concat(F.lit("dsir:"), F.col("gram"))) % n_buckets)

    # by_bucket is the diamond apex: it feeds BOTH totals and the weight
    # table. Unpersisted, each consumer replays the full gram explosion —
    # three corpus passes instead of the two the algorithm needs (one to
    # count, one to score). Persisting costs <= n_buckets rows (~KB);
    # unpersist via the returned frame's `_dsir_cache` handle (the
    # repo-wide tfidf _tf_cache contract).
    by_bucket = grams.groupBy("bucket").agg(
        F.sum("is_t").alias("cnt_t"), F.count("*").alias("cnt_s")
    ).persist()
    totals = by_bucket.agg(
        F.sum("cnt_t").alias("tot_t"), F.sum("cnt_s").alias("tot_s")
    )
    weights = by_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr(
            f"((cnt_t + 1) * (tot_s + {n_buckets}) * {q_scale}) div "
            f"((cnt_s + 1) * (tot_t + {n_buckets}))"
        ).alias("weight"),
    )

    scored = (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.sum("weight").alias("score"))
    )
    # Docs with no bigrams (empty/1-token text) score 0, kept explicit:
    base = docs.select(id_col).distinct()
    out = base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
    )
    out._dsir_cache = by_bucket
    return out
