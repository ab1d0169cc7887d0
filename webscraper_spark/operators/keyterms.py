"""Per-document keyterm extraction: TF-IDF top-k over the corpus.

Part of the LLM-training-data family (SURVEY 2.10): corpus-level term
statistics drive quality filtering, topic balancing, and boilerplate
detection. All column work is native codegen; the only driver-side value is
the corpus document count (a parquet-footer metadata job on a raw table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webscraper_spark.operators.dedup import tokens


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    persist_tf: bool = True,
) -> DataFrame:
    """Top-k terms per document by TF-IDF. Output: (doc_id, term, tf, df,
    score, rank), rank 1..k per doc ordered by score desc, term asc.

    The idf is the RATIONAL BM25-style form (N - df + 0.5)/(df + 0.5)
    rather than a log: it induces the same monotone-in-df ranking, and —
    built only from IEEE-754 +,-,*,/ on integers — every score is
    reproducible bit-for-bit by an independent SQL engine, so the
    correctness gate can hash-compare doubles (ln() implementations differ
    in the last ulp across engines and would make tie-breaks flaky).

    Scale design: tf is a map-side-combinable (doc, term) count; df is a
    second partial-aggregate over tf's output keyed only by term (NOT a
    count() window over term — a window has no partial aggregation, so a
    stopword appearing in 10^10 docs would land 10^10 rows on one task;
    the groupBy contributes one row per term per partition). N is one
    scalar from parquet footers; the per-doc top-k is a WindowGroupLimit
    (partial top-k both sides of the exchange — no corpus sort). The df
    side joins back to tf on term; at web scale the df relation is
    vocabulary-sized and usually broadcastable — left to AQE, which sees
    its post-agg size at runtime.

    tf feeds BOTH the df aggregate and the join probe; without
    materialization Catalyst recomputes the branch, scanning and exploding
    the whole corpus twice (verified via .explain — no exchange reuse:
    the two branches' partial aggregates differ). `persist_tf` (default)
    caches the much-smaller distinct (doc, term, tf) relation
    MEMORY_AND_DISK for the diamond; the returned DataFrame carries the
    cache as `._tf_cache` so callers can unpersist (same contract as
    minhash_lsh_pairs' shingle table). Pass False at corpus scales where
    even tf outweighs a second scan.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    if persist_tf:
        from pyspark import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    scored = tf.join(df_t, "term").withColumn(
        "score",
        F.col("tf").cast("double")
        * (F.lit(float(n_docs)) - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5)),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )
    if persist_tf:
        out._tf_cache = tf  # explicit unpersist handle (see docstring)
    return out
