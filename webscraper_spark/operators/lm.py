"""Unigram language-model quality scoring (CCNet-style in-domain filter).

CCNet (Wenzek et al., 2020, public paper) scores crawled documents by the
perplexity of a language model trained on a trusted reference corpus
(Wikipedia) and keeps the low-perplexity head. This operator reproduces
that shape Spark-first: train an add-one-smoothed unigram LM over a
reference slice of the corpus, then score every document by its mean
per-token likelihood under that model.

Reference parity note: the Ruby reference app has no corpus-quality stage
(it is a crawl/extract app — see /root/reference/app/controllers/
cars_controller.rb); this operator is part of the beyond-reference
LLM-training-data family mandated by the assignment (SURVEY 2.10).

Bit-reproducibility: the canonical CCNet statistic is a geometric mean
(log-space perplexity), but ln() differs in the last ulp across engines,
which would make the correctness gate's hash compare flaky — the same
reason keyterms.tfidf_topk uses the rational idf. The score here is the
ARITHMETIC-mean likelihood: an integer numerator
    lm_num = sum_t tf(t) * (cnt_ref(t) + 1)
(add-one smoothing; cnt_ref = 0 for out-of-vocabulary terms) divided once
by the integer n_tok * (total_ref + V). One correctly-rounded IEEE-754
division of two exact integers — any ANSI engine reproduces it
bit-for-bit. It serves the same purpose (rank documents by in-domain-ness;
keep the high-likelihood head for training).

Scale design (100 TB corpus):
- The reference-slice vocabulary is a map-side-combinable term count; its
  output is vocabulary-sized (10^6-10^8 rows), far below corpus size.
- Per-doc tf is a map-side-combinable (doc, term) count; the tf->vocab
  join is keyed on term, and AQE sees the post-aggregate vocab size at
  runtime, so it broadcasts when the vocabulary fits (typical) and
  shuffle-joins otherwise. Super-common terms do NOT skew the join probe:
  tf has at most one row per (doc, term).
- The only driver-side values are two scalars (total_ref, |V|) from a
  single-row aggregate — no corpus data reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webscraper_spark.operators.dedup import tokens


def unigram_lm_score(
    docs: DataFrame,
    ref_filter: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document by arithmetic-mean add-one-smoothed unigram
    likelihood under a model trained on `docs.filter(ref_filter)`.

    Output: (doc_id, n_tok, lm_num, lm_score) — lm_score in (0, 1],
    0.0 for empty documents; higher = more in-domain. lm_num is the exact
    integer numerator so downstream consumers (and the oracle) can verify
    the double was produced by a single division.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        ref_filter.alias("is_ref"),
        F.explode_outer(tokens(F.col(text_col))).alias("term"),
    )
    # Reference-slice vocabulary: term -> total occurrences (map-side combine).
    vocab = (
        toks.filter(F.col("is_ref") & F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    # Two scalars; single-row aggregate, the only driver-side values.
    row = vocab.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("total_ref"),
        F.count("*").alias("v"),
    ).collect()[0]
    denom_per_tok = int(row["total_ref"]) + int(row["v"])
    if denom_per_tok == 0:
        raise ValueError("unigram_lm_score: reference slice has no tokens")

    tf = (
        toks.filter(F.col("term").isNotNull())
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    per_doc = (
        tf.join(vocab, "term", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tok"),
            F.sum(F.col("tf") * (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1))).alias("lm_num"),
        )
    )
    # Keep empty docs in the output (explode_outer gave them a null term row).
    ids = toks.select("doc_id").distinct()
    return (
        ids.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
            F.coalesce("lm_num", F.lit(0)).alias("lm_num"),
            F.when(F.coalesce(F.col("n_tok"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("lm_num").cast("double")
                / (F.col("n_tok") * F.lit(denom_per_tok)).cast("double")
            )
            .alias("lm_score"),
        )
    )
