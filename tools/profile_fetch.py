"""Bisect the w1 fetch+extract+write stage: which component anti-scales 8->32?

Replicates bench wave 1: batch = all detail URLs of the sf0.4 corpus,
broadcast-joined against pages, Arrow-extracted, derived, written.

Usage: python3 tools/profile_fetch.py <cores> <variant> [sf]
Variants:
  scan    - pages scan -> noop
  join    - scan + broadcast join -> noop
  udf     - join + with_extraction_arrow -> noop
  derive  - udf + extracted_text/wave/fetch_bytes/drop -> noop
  write   - derive + parquet write (the full stage)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cores = int(sys.argv[1])
    variant = sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "0.4"
    from pyspark.sql import functions as F

    from webscraper_spark.functions.extract import extracted_text, listing_text
    from webscraper_spark.functions.extract_pandas import with_extraction_arrow
    from webscraper_spark.plans.wave import tune_scan_splits
    from webscraper_spark.session import get_spark

    spark = get_spark(app_name=f"pf{cores}", cores=cores)
    pages = spark.read.parquet(os.path.join(REPO, ".cache", f"corpus_sf{sf}", "pages"))
    tune_scan_splits(spark, pages)
    pages = spark.read.parquet(os.path.join(REPO, ".cache", f"corpus_sf{sf}", "pages"))

    batch = (
        pages.filter(~F.col("url").contains("/inventory?"))
        .select("url")
        .withColumn("host", F.lit("h"))
        .withColumn("depth", F.lit(1))
        .withColumn("disc_wave", F.lit(1))
        .withColumn("disc_pos", F.lit(0).cast("long"))
        .withColumn("rank", F.lit(1).cast("long"))
        .withColumn("sched_ms", F.lit(0).cast("long"))
        .withColumn("in_budget", F.lit(True))
    ).persist()
    n = batch.count()

    def build(v):
        if v == "scan":
            return pages.select(F.length("html").alias("n"))
        hits = pages.join(F.broadcast(batch), "url", "inner").withColumn("fetch_status", F.lit("ok"))
        if v == "join":
            return hits.select(F.length("html").alias("n"), "rank")
        fetched = with_extraction_arrow(hits)
        if v == "udf":
            return fetched.select("x_title", "x_status", "x_outlinks_canon")
        fetched = (
            fetched.withColumn(
                "extracted_text",
                F.when(F.col("x_status") == "listing", listing_text())
                .when(F.col("x_status") == "ok", extracted_text())
                .otherwise(F.lit(None).cast("string")),
            )
            .withColumn("wave", F.lit(1))
            .withColumn("fetch_bytes", F.coalesce(F.length("html").cast("long"), F.lit(0)))
            .drop("html", "text")
        )
        return fetched

    out = os.path.join("/tmp", f"pf_{cores}_{variant}")

    def run():
        df = build(variant)
        if variant == "write":
            df.write.mode("overwrite").parquet(out)
        else:
            df.write.format("noop").mode("overwrite").save()

    run()  # warmup
    times = []
    for _ in range(2):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    print(f"RESULT cores={cores} variant={variant} batch={n} best={min(times):.2f}s all={[round(t,2) for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
