"""Duplicate-cluster resolution: near-dup PAIRS -> connected COMPONENTS ->
one keeper per cluster.

Pairwise dedup (ngram_jaccard_pairs / minhash_lsh_pairs) answers "which
docs are similar"; a training-data pipeline needs the transitive closure:
if A~B and B~C, all three are one cluster and exactly one survives. This
module computes that closure with the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) expressed entirely in DataFrame ops:

  - each round is two (groupBy min + join) passes — plain hash shuffles on
    the node id, no driver-side graph state, no collect;
  - converges in O(log^2 n) rounds on ANY graph shape (a chain of 1M
    near-identical docs converges in ~20 rounds where naive min-label
    propagation needs 1M);
  - per-round localCheckpoint truncates the logical plan, so lineage stays
    O(1) instead of compounding a join tree per iteration (swap for
    checkpoint() on a real cluster if driver-loss recovery matters).

The output labels every node with the MINIMUM id of its component —
deterministic, so a recursive-CTE SQL oracle reproduces it exactly.

Reference parity note: the reference engine has no graph/closure operator
at all — its dedup story ends at pandas drop_duplicates
(Configurable_ETL_Python.py:48,293,406); this is part of the LLM-pipeline
extension surface the brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_digest(e: DataFrame) -> tuple[int, int]:
    """(row count, order-independent xxhash64 sum) — one aggregate, used as
    the convergence test. The sum runs as decimal(38,0): wide enough that
    summing 2^64-scale terms can't overflow ANSI arithmetic, and
    order-independent so partitioning doesn't matter."""
    row = e.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: for each node u, attach every LARGER neighbor v to
    m = min(neighborhood(u) + {u}). Input must be symmetric (both
    directions); output edges all point larger -> smaller."""
    mins = e.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("u"), F.col("mv"))
    return (
        e.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: for each node u (edges point larger -> smaller, so all
    neighbors here are < u), attach u and its neighbors to the minimum."""
    mins = e.groupBy("u").agg(F.min("v").alias("mv"))
    neighbor_edges = e.join(mins, "u").select(
        F.col("v").alias("u"), F.col("mv").alias("v")
    )
    self_edges = mins.select("u", F.col("mv").alias("v"))
    return (
        neighbor_edges.union(self_edges)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _normalize_edges(e: DataFrame) -> DataFrame:
    """Orient larger -> smaller, drop loops, dedup — the star rounds'
    input contract."""
    return (
        e.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def _star_labels(e: DataFrame, max_iter: int) -> DataFrame:
    """Iterate large-star/small-star on normalized edges to the fixed
    point; return (id, cluster_id = component minimum) for every node
    appearing in `e`."""
    e = e.localCheckpoint(eager=True)
    digest = _edge_digest(e)
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        e2 = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        new_digest = _edge_digest(e2)
        e.unpersist()
        e = e2
        if new_digest == digest:
            break
        digest = new_digest
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # at the fixed point every edge is (node -> component minimum);
    # the minima themselves appear only on the v side
    roots = e.select(F.col("v").alias("u"), F.col("v")).distinct()
    return e.union(roots).distinct().select(
        F.col("u").alias("id"), F.col("v").alias("cluster_id")
    )


def _max_degree(e: DataFrame) -> int:
    """Maximum symmetric degree over normalized edges — one groupBy+max
    aggregate, O(edges). Cheap relative to even a single star round
    (which is two groupBy+join passes over the same edges)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    row = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d")).agg(
        F.max("d").alias("m")
    ).first()
    return int(row["m"]) if row["m"] is not None else 0


def _cap_edges(e: DataFrame, cap: int) -> DataFrame:
    """Per-node degree thinning: from the symmetric adjacency, keep each
    node's edges to its `cap` SMALLEST neighbors. Deterministic (ids are
    distinct), and the row_number-under-constant filter compiles to
    WindowGroupLimit, so every map partition pre-prunes to its local
    top-cap per node before the shuffle — a hot node never ships its
    full adjacency to one reducer.

    NOT component-preserving on its own (a bridge whose two endpoints
    both have `cap` smaller neighbors elsewhere is dropped — pinned in
    tests); only valid paired with the contraction pass in
    connected_components."""
    from pyspark.sql import Window

    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u").orderBy(F.col("v").asc())
    kept = (
        sym.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
    return _normalize_edges(kept)


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
    degree_cap: "int | None" = None,
) -> DataFrame:
    """(id, cluster_id) for every node appearing in `pairs`, where
    cluster_id is the minimum id of the node's connected component.

    Alternates large-star / small-star until the edge set reaches a fixed
    point (each round is checked with a count+hash digest, one aggregate).
    max_iter is a safety valve: 50 rounds covers components of ~2^50 nodes;
    hitting it raises rather than returning a partial closure.

    degree_cap bounds the edge volume the O(log^2 n) iterations touch —
    the scale lever for boilerplate-heavy corpora where near-dup clusters
    are cliques (m docs -> m^2/2 LSH pairs; x16's sf1 edge-volume exponent
    was 0.81 uncapped). Engagement is ADAPTIVE: one O(edges) degree probe
    skips the whole capped machinery when no node exceeds the cap (then
    capping is an identity and the plain star rounds are already optimal).
    When it binds — two phases, EXACT for any cap >= 1:

      1. star rounds on the capped subgraph (<= cap * N edges per round)
         -> labels that REFINE the true components;
      2. contract the FULL edge set through those labels (one linear
         pass: two id-joins + distinct — AQE broadcasts the label side
         when small), then re-run the star rounds on the contracted
         graph, whose nodes are phase-1 roots (tiny: one node per
         sub-cluster, edges only where sub-clusters touch).

    Components of the contraction quotient correspond 1:1 to true
    components (a u~v edge merges exactly its endpoints' phase-1 labels),
    so composing the two labelings reproduces the uncapped answer
    bit-for-bit — min-composes with min, and every step is deterministic.
    Equality with the uncapped path is pinned in tests, including a
    bridge graph where the capped subgraph ALONE is disconnected."""
    e = _normalize_edges(
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    )
    if degree_cap is None:
        return _star_labels(e, max_iter)
    if degree_cap < 1:
        raise ValueError(f"degree_cap must be >= 1, got {degree_cap}")
    # multi-consumer relations ride the SCOPED CACHE, not localCheckpoint:
    # e feeds the degree probe + phase 1 + the contraction, lab1 feeds the
    # contraction's two sides + the final compose — and unreleased
    # checkpoint blocks from one query measurably tax the next (the r5
    # skew finding; cache eviction is recompute-safe, and lab1's recompute
    # is cheap because _star_labels' result lineage is truncated at its
    # fixpoint checkpoint)
    from .dedup import _scope_cache

    e = _scope_cache(e)
    # Adaptive engagement: the two-phase capped path costs an extra
    # window pass + contraction + compose (~1.6x measured on a corpus
    # where no node exceeds the cap), and buys nothing unless some node's
    # degree actually exceeds the cap. One O(edges) aggregate decides —
    # the same runtime-statistics-over-static-plan tradeoff AQE makes.
    # When the probe says the cap never binds, _cap_edges would return
    # the edge set unchanged and phase 2 would relabel an
    # already-correct labeling, so skipping it is exact by construction.
    if _max_degree(e) <= degree_cap:
        return _star_labels(e, max_iter)
    lab1 = _scope_cache(_star_labels(_cap_edges(e, degree_cap), max_iter))
    lu = lab1.withColumnsRenamed({"id": "u", "cluster_id": "lu"})
    lv = lab1.withColumnsRenamed({"id": "v", "cluster_id": "lv"})
    contracted = _normalize_edges(
        e.join(lu, "u").join(lv, "v").select(
            F.col("lu").alias("u"), F.col("lv").alias("v")
        )
    )
    lab2 = _star_labels(contracted, max_iter)
    return (
        lab1.join(
            lab2.select(
                F.col("id").alias("cluster_id"),
                F.col("cluster_id").alias("root"),
            ),
            "cluster_id",
            "left",
        )
        .select(
            "id",
            F.coalesce("root", "cluster_id").alias("cluster_id"),
        )
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    degree_cap: "int | None" = None,
    score_col: "str | None" = None,
) -> DataFrame:
    """Assign EVERY document a duplicate-cluster id and mark the keeper.

    Documents untouched by any pair are singleton clusters of themselves.
    Output: (doc_id, cluster_id, cluster_size, is_keeper) with
    cluster_id = min doc_id in the component and is_keeper true exactly
    once per cluster. Downstream, `WHERE is_keeper` is the deduplicated
    corpus.

    Keeper policy: min doc_id (deterministic) by default; `score_col`
    names a numeric column on `docs` and switches to QUALITY-AWARE
    selection — the cluster's highest-scoring doc survives (ties break
    to the smaller id; NULL scores rank below every real score and can
    never be the keeper unless the whole cluster is NULL-scored, which
    falls back to min id), which is what a curation pipeline
    actually wants (keep the longest / highest-classifier-score copy,
    drop the truncated mirror). The argmax is a min(struct(-score, id))
    HashAggregate — map-side partial combine, so a million-doc
    boilerplate cluster never ships its members to one reducer (the d8
    span-dedup skew shape).

    The join of docs against the component labels is a left join on the
    doc id — at 100 TB the label side holds only docs that matched some
    pair (usually a small fraction), so AQE broadcasts it when small and
    shuffles otherwise. degree_cap forwards to connected_components
    (exact two-phase edge thinning — same labels, bounded per-round edge
    volume)."""
    labels = connected_components(pairs, src_col, dst_col,
                                  degree_cap=degree_cap)
    cols = [F.col(id_col).alias("doc_id")]
    if score_col is not None:
        cols.append(F.col(score_col).alias("__score"))
    ids = docs.select(*cols)
    labeled = ids.join(
        labels.withColumnsRenamed({"id": "doc_id"}), "doc_id", "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    if score_col is None:
        return labeled.join(sizes, "cluster_id").select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
        )
    keepers = labeled.groupBy("cluster_id").agg(
        F.min(
            F.struct(
                # NULL scores fold to ns = +inf so they can never win the
                # keeper slot (a raw NULL negates to NULL, which sorts
                # FIRST in min(struct) and would silently beat every
                # scored doc); an all-NULL cluster falls back to min id
                F.coalesce(
                    -F.col("__score").cast("double"),
                    F.lit(float("inf")),
                ).alias("ns"),
                F.col("doc_id").alias("kid"),
            )
        )["kid"].alias("__keeper_id")
    )
    return (
        labeled.join(sizes, "cluster_id")
        .join(keepers, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("__keeper_id")).alias("is_keeper"),
        )
    )
