"""Connected components over a near-duplicate pair graph — the clustering
step a 100 TB dedup pipeline runs AFTER LSH pair generation, so each
duplicate cluster keeps exactly one canonical document.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) expressed as
DataFrame joins + aggregations. Converges in O(log n) rounds regardless of
component diameter (a naive min-label propagation needs O(diameter) rounds
— a 1M-doc chain of near-dups would take 1M rounds; large-star/small-star
takes ~20). Each round is two hash aggregations + two joins on the node id,
all map-side combinable; per-round lineage is truncated with
localCheckpoint so the plan stays flat (on a real cluster use a reliable
checkpoint dir — same call shape).

Reference parity: the reference engine has no clustering operator; this is
part of the LLM-training-data family the engine adds (see SURVEY.md §2 —
dedup/simsearch). The pair input is typically minhash_lsh_pairs /
simhash_pairs / embedding_near_dup_pairs from operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _signature(edges: DataFrame) -> tuple:
    """Order-independent checksum of an edge set: (count, sum of per-edge
    64-bit hashes as decimal(38,0) — decimal so ANSI mode can't overflow)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("s"),
    ).first()
    return (row["n"], row["s"])


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """(node long, component long) for every node that appears in `edges`,
    where component = the minimum node id reachable from it (deterministic
    canonical representative).

    Large-star: every node points its larger neighbours at min(Γ⁺(u)).
    Small-star: every node folds its smaller neighbours onto min(N(u)).
    Iterate until the edge set is a fixpoint (then it IS the star graph
    node → component-min). Fixpoint detection compares an order-independent
    checksum — one tiny aggregate per round, no subtract/except job.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    # Canonical orientation u > v, deduped.
    a = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    prev = _signature(a)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # Large-star over the symmetrized adjacency: for each u,
        # m = min(N(u) ∪ {u}); emit (v, m) for every neighbour v > u.
        sym = a.unionByName(a.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("mn"), F.col("u")).alias("m")
        )
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # Small-star over (u > v) edges: m = min(N(u)); emit (v, m) for
        # v ≠ m plus the rename edge (u, m).
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(mins2, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .distinct()
        )
        a = ss.localCheckpoint()
        sig = _signature(a)
        if sig == prev:
            break
        prev = sig
    # At the fixpoint `a` is a star graph (u → component-min); roots map to
    # themselves. groupBy-min is belt-and-braces against a non-converged
    # max_iter exit (still returns a valid refinement).
    mapping = a.select(F.col("u").alias("node"), F.col("v").alias("component")).unionByName(
        a.select(F.col("v").alias("node"), F.col("v").alias("component"))
    )
    out = mapping.groupBy("node").agg(F.min("component").alias("component"))
    out._n_rounds = rounds  # instrumentation for tests/benchmarks
    return out


def neardup_components(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Assign every document its near-dup cluster id: (doc_id, component_id).

    `pairs` is an (id_a, id_b, ...) near-dup pair table (e.g. from
    minhash_lsh_pairs); `docs` supplies the full id universe so singletons
    (docs with no near-dup) map to themselves. The canonical keep-document
    of a cluster is the one with doc_id == component_id.
    """
    cc = connected_components(pairs, "id_a", "id_b")
    ids = docs.select(F.col(id_col).cast("long").alias(id_col))
    out = (
        ids.join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(id_col, F.coalesce("component", F.col(id_col)).alias("component_id"))
    )
    out._n_rounds = getattr(cc, "_n_rounds", None)
    return out
