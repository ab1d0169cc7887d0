"""Isolate per-stage scaling: scan -> extract UDF -> noop, at a given core count.

Usage: python3 tools/profile_stage.py <cores> [stage]
Stages: extract | scan | canon | all
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cores = int(sys.argv[1])
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    from pyspark.sql import functions as F

    from webscraper_spark.plans.wave import tune_scan_splits
    from webscraper_spark.session import get_spark

    spark = get_spark(app_name=f"profile{cores}", cores=cores)
    pages = spark.read.parquet(os.path.join(REPO, ".cache", "corpus_sf0.1", "pages"))
    tune_scan_splits(spark, pages)
    pages = spark.read.parquet(os.path.join(REPO, ".cache", "corpus_sf0.1", "pages"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, fn, warm=True):
        if warm:
            fn()
        best = min(timeit(fn) for _ in range(2))
        print(f"{label} cores={cores}: {best:.2f}s")

    def timeit(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    if which in ("scan", "all"):
        timed("scan+count-bytes", lambda: noop(pages.select(F.length("html").alias("n"))))
    if which in ("extract", "all"):
        from webscraper_spark.functions.extract_pandas import with_extraction_arrow

        timed("extract-arrow", lambda: noop(with_extraction_arrow(pages).select("x_title", "x_status", "x_outlinks")))
    if which in ("canon", "all"):
        from webscraper_spark.functions.canon import canon_host_arrow
        from webscraper_spark.functions.extract_pandas import with_extraction_arrow

        links = with_extraction_arrow(pages).select(F.explode("x_outlinks").alias("raw_url"))
        timed("extract+canon", lambda: noop(links.select(canon_host_arrow(F.col("raw_url")).alias("ch"))))
    spark.stop()


if __name__ == "__main__":
    main()
