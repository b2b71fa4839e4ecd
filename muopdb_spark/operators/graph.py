"""Duplicate-cluster resolution: connected components over near-dup
pairs. Pair-finding (exact/MinHash/SimHash/Jaccard — operators/dedup.py)
yields EDGES; a curation pipeline needs the transitive CLUSTERS ("A~B,
B~C => keep one of {A,B,C}"), i.e. connected components with the
minimum member id as the cluster label.

Spark-first shape: iterative min-label propagation —
    label(v) <- min(label(v), min over neighbors u of label(u))
repeated to fixpoint. Each iteration is one equi-join + one groupBy
(both on id — partial aggregation applies); the driver loop only checks
a converged-count, mirroring the bounded driver loops the engine
already uses for k-means splitting (index/ivf.py V7). Convergence takes
O(component diameter) rounds; near-dup clusters are shallow (dozens of
docs), so a handful of rounds suffices — `max_iter` bounds pathological
chains and raises rather than returning a half-propagated labelling.

Scale notes (100 TB):
  - Edges for dedup are SPARSE (candidate pairs post-verification), so
    each round shuffles |V|+|E| slim (id, label) rows, nothing else.
  - For adversarial graphs (long chains), swap the propagation body for
    the large-star/small-star rounds of Kiveris et al. "Connected
    Components in MapReduce" — same join/groupBy primitives, fewer
    rounds; the fixpoint check below is already the required harness.
  - The result is deterministic (min id), so it is oracle-checkable
    via a recursive-CTE transitive closure on the same pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id_col, component) — component = min node id transitively
    reachable. `nodes` may include isolated ids (their own component).
    """
    # edges derive from the pair-finding subtree (an expensive
    # join/verify pipeline for near-dup edges): checkpoint ONCE so the
    # per-iteration join reads materialized rows instead of re-running
    # that subtree every round (measured r5: d6 at sf0.01 36 s -> 5 s)
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(id_col).alias("a")).distinct() \
        .withColumn("label", F.col("a"))
    for _ in range(max_iter):
        # min label among self and neighbors
        neighbor = (
            sym.join(labels, "a")
            .select(F.col("b").alias("a"), "label")
        )
        # localCheckpoint, not persist: truncating the lineage keeps
        # round i's plan O(1) instead of O(i) deep (iterative plans are
        # where driver-side re-planning costs compound), and the
        # convergence-check join cannot race a recomputable cache
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("a").agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "a")
            .filter(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("a").alias(id_col), F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds the bound; raise max_iter or use "
        "star-contraction rounds)"
    )


def dup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster report over near-dup pairs:
    (id_col, cluster_id, cluster_size, is_canonical) — canonical = the
    minimum id of the cluster (the doc a dedup pass would keep)."""
    comp = connected_components(
        nodes.select(F.col(id_col).alias("id")),
        pairs.select(F.col(pair_a).alias("src"), F.col(pair_b).alias("dst")),
        max_iter=max_iter,
    )
    w = Window.partitionBy("component")
    return (
        comp.withColumn("cluster_size", F.count("*").over(w))
        .select(
            F.col("id").alias(id_col),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size"),
            (F.col("id") == F.col("component")).alias("is_canonical"),
        )
    )


def cluster_representatives(
    clusters: DataFrame,
    scores: DataFrame,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-aware duplicate-cluster resolution: instead of keeping
    the arbitrary min-id member (`dup_clusters.is_canonical`), keep
    the HIGHEST-SCORING member of each near-dup cluster — the FineWeb
    refinement where the surviving copy of duplicated content is its
    best version (longest / highest quality), not whichever crawled
    first. Deterministic: ties break to the smallest id.

    Inputs: `clusters` = (id_col, cluster_col) membership (d6 shape),
    `scores` = (id_col, score_col) with an engine-stable score (pass
    PRE-ROUNDED scores — e.g. textstats.quality_features' round-6
    `quality` — so the argmax cannot flip on last-bit float skew).
    Output: (id_col, cluster_col, score_col, keeper_id, keep).

    Scale (100 TB): the per-cluster winner is an AGGREGATE
    max(struct(score, -id)) — partial aggregation collapses each
    partition's cluster members before the shuffle, so the exchange
    carries ~distinct-cluster rows even for whale clusters (the
    boilerplate cluster with 10^7 members never converges on one
    reducer's sort like a rank-window would). The keeper table
    (one row per cluster) joins back by cluster id — AQE picks
    broadcast when it fits. No window anywhere.
    """
    # LEFT join + in-plan fail-fast: an inner join here would silently
    # drop any cluster member missing a score row — it could neither be
    # reported nor win, and if the dropped doc was the best member the
    # keeper would silently change (round-8 ADVICE). raise_error keeps
    # the guard inside the existing job (no extra validation action,
    # unlike the collect()-based opq_encode_per_user check) and names
    # the offending doc id.
    m = clusters.select(id_col, cluster_col).join(
        scores.select(id_col, F.col(score_col).alias("_score")), id_col, "left"
    ).withColumn(
        "_score",
        F.when(
            F.col("_score").isNull(),
            F.raise_error(
                F.concat(
                    F.lit("cluster_representatives: missing or null "
                          "score for clustered doc "),
                    F.col(id_col).cast("string"),
                    F.lit("; scores must cover every clustered doc "
                          "with a non-null score"),
                )
            ).cast("double"),
        ).otherwise(F.col("_score")),
    )
    winners = (
        m.groupBy(cluster_col)
        .agg(
            F.max(
                F.struct(
                    F.col("_score").alias("s"),
                    (-F.col(id_col)).alias("nid"),
                )
            ).alias("w")
        )
        .select(cluster_col, (-F.col("w.nid")).cast("long").alias("keeper_id"))
    )
    return m.join(winners, cluster_col).select(
        id_col,
        cluster_col,
        F.col("_score").alias(score_col),
        "keeper_id",
        (F.col(id_col) == F.col("keeper_id")).alias("keep"),
    )


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    n_iter: int = 5,
) -> DataFrame:
    """Fixed-iteration weighted PageRank over an edge table —
    (node, rank) after exactly `n_iter` power iterations from the
    uniform start, the classic formulation (Page et al. 1999, public)
    with dangling-mass redistribution:

        r_{k+1}(v) = (1-d)/N
                     + d * ( sum_{u->v} r_k(u) * w(u,v) / W_out(u)
                             + D_k / N ),
        D_k = sum of r_k over nodes with no out-edges.

    Fixed iteration count (not convergence) keeps the result exactly
    reproducible and SQL-oracle-able — the curation use (a URL
    quality prior, the RefinedWeb/Gopher idea) ranks domains, whose
    graph diameter makes a handful of iterations sufficient.

    100 TB shape: each iteration is one broadcast-able (node, rank)
    join against the edge table + one groupBy(dst) partial-agg; the
    rank table is |domains|-sized (millions of rows, not corpus-
    sized), edges are checkpointed once, ranks each round (the
    connected_components lineage lesson). Self-loops are dropped (a
    site linking itself is not endorsement)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"pagerank: damping must be in (0,1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"pagerank: n_iter must be >= 1, got {n_iter}")
    w = (
        F.col(weight_col).cast("double") if weight_col
        else F.lit(1.0)
    )
    e = (
        edges.filter(F.col(src_col) != F.col(dst_col))
        .select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            w.alias("_w"),
        )
        .groupBy("_src", "_dst").agg(F.sum("_w").alias("_w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_wout"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            e.join(out_w, "_src")
            .join(ranks, e["_src"] == ranks["node"])
            .groupBy("_dst")
            .agg(F.sum(F.col("rank") * F.col("_w") / F.col("_wout"))
                 .alias("_in"))
        )
        dangling = (
            ranks.join(out_w, ranks["node"] == out_w["_src"],
                       "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(dangling))
            .join(contrib, nodes["node"] == contrib["_dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0))
                       + F.col("_dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
