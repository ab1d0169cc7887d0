"""Link-graph PageRank for crawl prioritization.

A frontier scheduler at 10^10-URL scale wants a global page-importance
signal, not just per-host FIFO + depth (operators/schedule.py): PageRank
over the outlink graph is the classic one (Page et al., 1999 — the
original use case WAS crawl ordering). The reference app crawls two fixed
sites and needs no graph signal; this is part of the beyond-reference
crawl-scheduling family (SURVEY 2.10).

Fixed-point integer arithmetic: the textbook formulation
    r' = (1-d)/n + d * sum_{src->dst} r(src)/deg(src)
accumulates floating-point sums whose value depends on addition order —
unverifiable by an independent engine (the correctness gate hash-compares
values). This implementation keeps ranks as integers at a fixed scale
(default 10^12): per-node share = rank // deg, damped sum =
(d_num * sum) // d_den, base = ((d_den - d_num) * scale // d_den) // n.
Every operation is integer +,*,// on positive values — associative,
commutative, and bit-identical in any engine — so an 8-iteration power
iteration is replayable as 8 chained SQL CTEs. Rank mass lost to floor
division and to dangling nodes (no outlinks) is NOT redistributed — the
standard simplification; ranks are a priority signal, not a probability
distribution.

Scale design (10^10-node graph):
- Each iteration is one join (edges x ranks, keyed on src — edges can be
  pre-bucketed by src to make every iteration shuffle-free on that side)
  plus one map-side-combinable sum keyed on dst.
- Out-degrees are computed once; the per-iteration rank relation is
  node-cardinality (thin). Each iteration's result is persisted and the
  previous unpersisted, so the plan doesn't re-run the whole chain per
  action; at cluster scale, checkpoint every ~5 iterations to truncate
  lineage (`checkpoint_every`).
- High in-degree skew (a page linked from 10^7 others) is absorbed by the
  partial aggregate: each map task emits one partial sum per dst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = 8,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    checkpoint_every: int = 0,
) -> DataFrame:
    """PageRank over (src, dst) long-id edges; returns (node, rank) with
    integer ranks at `scale` (rank/scale ~ the PageRank score).

    Self-loops and duplicate edges are kept as-is (deterministic; callers
    dedup first if they want simple-graph semantics). Nodes appearing only
    as dst (dangling) receive rank but contribute none.
    """
    from pyspark import StorageLevel

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    n_nodes = nodes.count()  # driver scalar (node-cardinality agg, like tfidf's N)
    base = ((damping_den - damping_num) * scale // damping_den) // n_nodes
    init = scale // n_nodes

    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    for i in range(n_iter):
        shares = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("rank div deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        ranks = nodes.join(shares.withColumnRenamed("dst", "node"), "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_num} * coalesce(c, 0L)) div {damping_den}")
            ).cast("long").alias("rank"),
        )
        # The rank chain is linear (each iteration consumed exactly once),
        # so intermediates are NOT persisted — only lineage depth matters,
        # handled by periodic checkpointing for large n_iter.
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.persist(StorageLevel.MEMORY_AND_DISK)  # multi-action callers
    out._rank_cache = out  # explicit unpersist handle (tfidf _tf_cache contract)
    out._nodes_cache = nodes
    return out


def anchor_profile(edges: DataFrame, k: int = 3) -> DataFrame:
    """Inbound anchor-text aggregation per target URL (L32, SURVEY §2.10).

    Search engines and LLM-corpus builders treat the anchor text of a
    page's inbound links as an independent description of the page
    (Brin & Page 1998 §2.2 store anchors WITH the target, not the
    source; the "anchor document" is a standard web-IR artifact). The
    reference harvests hrefs but drops their text
    (`/root/reference/app/controllers/cars_controller.rb:142` maps
    `a['href']` only); at corpus scale the aggregation is the engine's
    job.

    Input: one row per link — (src, dst, anchor). Output: one row per
    dst — total inbound links, distinct anchor strings, and the top-k
    anchors by frequency (count desc, anchor asc tiebreak) joined as
    `top_anchors` ("a|b|c").

    Scale notes: two map-side-combinable hash aggregations keyed on
    (dst, anchor) then dst — both partial-agg friendly, so a dst with
    10^7 inlinks ("home"-page skew) collapses per map task before the
    shuffle. The top-k window runs over the already-collapsed
    (dst, anchor) relation (distinct anchors per dst, small), and Spark
    rewrites rank-filter windows to WindowGroupLimit (per-partition
    top-k before the shuffle). No Python, no explode of the heavy side.
    """
    from pyspark.sql import Window

    counts = edges.groupBy("dst", "anchor").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("anchor"))
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    top = (
        ranked.filter(F.col("rnk") <= k)
        .groupBy("dst")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rnk", "anchor"))),
                    lambda s: s.anchor,
                ),
                "|",
            ).alias("top_anchors")
        )
    )
    totals = counts.groupBy("dst").agg(
        F.sum("cnt").alias("inlinks"), F.count("*").alias("n_anchors")
    )
    return totals.join(top, "dst")
