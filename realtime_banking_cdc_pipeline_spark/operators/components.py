"""Connected components over a pair/edge list — the clustering step a
near-dup dedup pipeline needs after candidate pairs are found (pairs
A~B, B~C must collapse to ONE canonical doc, not two independent
removals).

Iterative min-label propagation: every node starts labeled with its own
id; each round a node takes the min of its own and its neighbors'
labels; fixpoint = every node holds the min id of its component (the
deterministic canonical id).

Scale shape: each round is one join (edges ⋈ labels, both hash-
partitioned on the same key) + one min-aggregation — no driver-side
graph state; the label frame is localCheckpoint'd per round so the
driver loop doesn't grow an unbounded lineage. Rounds needed = graph
diameter, which for near-dup clusters is tiny (dup chains are short).
A 100 TB corpus with adversarially long chains would swap this loop
for the alternating large-star/small-star algorithm (O(log n) rounds,
same per-round join shape); the interface is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import CheckpointScope, promote_scope, track_local_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 30,
) -> DataFrame:
    """Return (id, component) where component is the min node id of the
    connected component. ``nodes`` (single-column) optionally adds
    isolated vertices (component = own id); otherwise only edge
    endpoints appear.
    """
    # Eager checkpoint: every iteration's plan re-embeds sym's lineage
    # (for near-dup callers that is the whole MinHash/LSH candidate
    # pipeline), so a lazy persist left Catalyst re-analyzing the full
    # tree each round; the checkpoint truncates it to a scan.
    sym = track_local_checkpoint(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    ids = sym.select(F.col("a").alias("id"))
    if nodes is not None:
        ids = ids.unionByName(nodes.toDF("id"))
    # Per-round CheckpointScope: once round i's frame is materialized,
    # round i-1's checkpoint has no reader left (eager checkpoints never
    # recompute) — free it INSIDE the loop so live executor storage is
    # O(|V|), not O(rounds × |V|). The final round's checkpoint outlives
    # the function (the returned frame reads it), so it is promoted to
    # the global registry for the host's release_caches().
    cur = CheckpointScope()
    labels = cur.ckpt(ids.distinct().withColumn("label", F.col("id")))

    for _ in range(max_iter):
        lbl_t = dict(labels.dtypes)["label"]
        nbr = sym.join(labels.withColumnRenamed("id", "b"), "b").select(
            F.col("a").alias("id"), "label"
        )
        # Pointer-jump rows (label(label(id))): shortcut propagation
        # along the label graph collapses chains in O(log diameter)
        # rounds instead of diameter rounds (r17: measured 9 → 4 rounds
        # on the sf0.1 mutual-kNN graph; each round is fixed driver/job
        # overhead plus a |V|-row shuffle, so halving rounds halves the
        # loop). Correctness: labels only decrease and always name a
        # node of the same component (label(id)=j is in id's component,
        # so label(j) is too); at the fixpoint labels are constant per
        # component and label(min)=min always, hence = component min —
        # identical to plain min-label propagation.
        jump = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.label") == F.col("y.id"))
            .select(F.col("x.id").alias("id"), F.col("y.label").alias("label"))
        )
        # The node's previous label rides the same union/groupBy
        # exchange as the min (own rows carry old=label, neighbor and
        # jump rows old=NULL; min ignores NULLs and every id has exactly
        # one own row), so the convergence probe below is a limit(1)
        # scan of the checkpointed frame — no second join + shuffle per
        # round.
        nxt = CheckpointScope()
        new = nxt.ckpt(
            labels.withColumn("old", F.col("label"))
            .unionByName(nbr.withColumn("old", F.lit(None).cast(lbl_t)))
            .unionByName(jump.withColumn("old", F.lit(None).cast(lbl_t)))
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.min("old").alias("old"))
        )
        improved = new.filter(F.col("label") < F.col("old")).limit(1).count()
        cur.release()  # round i-1's checkpoint: new is materialized
        cur = nxt
        labels = new.select("id", "label")
        if improved == 0:
            break
    else:
        # loop exhausted max_iter without reaching the fixpoint: labels
        # are NOT component minima (diameter > max_iter) — surface it
        # instead of returning silently-wrong clusters
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} rounds "
            "(labels still improving); component diameter "
            "exceeds max_iter — raise max_iter or use "
            "connected_components_star for adversarially long chains",
            RuntimeWarning,
            stacklevel=2,
        )
    # sym is a tracked localCheckpoint now — released by the host's
    # release_caches() after the result is consumed (a checkpoint
    # cannot recompute, so freeing it here would break the labels
    # frame only if labels ever re-derived from it; labels is itself
    # checkpointed, so nothing downstream reads sym again).
    promote_scope(cur)  # final round's checkpoint backs the result
    return labels.select("id", F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Alternating large-star/small-star connected components — the
    adversarial-diameter fallback ``connected_components`` documents.

    Min-label propagation needs diameter-many rounds (a 10^6-node chain
    is 10^6 joins); star contraction converges in O(log n) rounds on
    ANY topology (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14 — public algorithm):

    - large-star: every node points its LARGER neighbors at its local
      minimum (min of neighborhood ∪ self),
    - small-star: every node points its smaller-or-equal neighbors and
      itself at that minimum,

    each expressible as one groupBy-min + one join per half-round —
    the same per-round shuffle shape as min-label, just O(log n) of
    them. Fixpoint = the edge set is a forest of stars whose centers
    are component minima. Same contract as ``connected_components``:
    returns (id, component=min node id), ``nodes`` adds isolated
    vertices.
    """
    # canonical undirected edge set, self-loops dropped
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .transform(track_local_checkpoint)
    )
    all_ids = e.select(F.col("a").alias("id")).unionByName(
        e.select(F.col("b").alias("id"))
    )
    if nodes is not None:
        all_ids = all_ids.unionByName(nodes.toDF("id"))
    all_ids = all_ids.distinct().transform(track_local_checkpoint)

    def star_round(cur: DataFrame, large: bool) -> DataFrame:
        # symmetric adjacency; m(u) = min(neighbors(u) ∪ u)
        adj = cur.select("a", "b").unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = adj.groupBy("a").agg(F.min("b").alias("mn"))
        mins = mins.select("a", F.least("mn", F.col("a")).alias("m"))
        if large:
            linked = adj.filter(F.col("b") > F.col("a"))
        else:
            linked = adj.filter(F.col("b") <= F.col("a")).unionByName(
                mins.select("a", F.col("a").alias("b"))
            )
        out = (
            linked.join(mins, "a")
            .select(F.col("b").alias("x"), F.col("m").alias("y"))
            .filter(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
            )
            .distinct()
        )
        return out.transform(track_local_checkpoint)

    converged = False
    for _ in range(max_iter):
        after_large = star_round(e, large=True)
        after_small = star_round(after_large, large=False)
        changed = (
            after_small.exceptAll(e).limit(1).count()
            + e.exceptAll(after_small).limit(1).count()
        )
        e = after_small
        if changed == 0:
            converged = True
            break
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components_star did not converge in {max_iter} "
            "alternation rounds — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )

    # forest of stars: every node's component is min(neighbors ∪ self)
    adj = e.select("a", "b").unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    comp = adj.groupBy("a").agg(F.min("b").alias("mn"))
    return (
        all_ids.join(comp.withColumnRenamed("a", "id"), "id", "left")
        .select(
            "id",
            F.least(F.coalesce("mn", F.col("id")), F.col("id")).alias("component"),
        )
    )


PR_SCALE = 1 << 20  # fixed-point scale for cross-engine-exact PageRank


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank over the symmetrized edge list, computed ENTIRELY in
    integer fixed-point (scale 2^20) so every engine produces the
    identical ranks — double mass-sums are order-dependent and would
    never hash across engines.

    Per iteration (all floor divisions):
        r'(v) = ((100-d)% * (S // N)) // 100
                + (d% * SUM_u[in-nbrs] (r(u) // deg(u))) // 100

    Nodes are the edge endpoints; symmetric edges mean deg >= 1
    everywhere, so there is no dangling mass to redistribute. The only
    driver-side state is the node COUNT (a scalar, same class as the
    high-water mark). Each round is one co-partitioned join + one hash
    agg on the node key — no per-round driver collect, no global sort;
    lineage stays bounded because iters is a small constant (ranks
    converge geometrically; production uses 10-20 rounds with the same
    shape, localCheckpoint'd like connected_components)."""
    from ..caching import track_persist

    sym = track_persist(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()  # scalar driver state (node count), documented above
    if n == 0:
        sym.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "id bigint, pr_fp bigint, pr double"
        )
    r0 = PR_SCALE // n
    base = ((100 - damping_pct) * r0) // 100
    r = track_persist(deg.withColumn("r", F.lit(r0)))
    for _ in range(iters):
        contrib = sym.join(r.withColumnRenamed("id", "a"), "a").select(
            F.col("b").alias("id"), F.expr("r div deg").alias("c")
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        r = deg.join(sums, "id").select(
            "id",
            "deg",
            (F.lit(base) + F.expr(f"({damping_pct} * s) div 100")).alias("r"),
        )
    out = r.select(
        "id",
        F.col("r").cast("bigint").alias("pr_fp"),
        (F.col("r").cast("double") / F.lit(float(PR_SCALE))).alias("pr"),
    )
    return out


def degree_oriented_edges(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Re-orient an undirected edge list low-degree → high-degree
    (tiebreak on vertex id) — the standard power-law hedge for wedge
    enumeration: after orientation every vertex's out-degree is
    O(sqrt(m)), so per-vertex wedge work is bounded even when a hub
    touches a constant fraction of all edges. Self-loops drop,
    duplicate/reversed duplicates collapse. The (deg, id) total order
    is acyclic, so each triangle still enumerates exactly once."""
    from ..caching import track_persist

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = track_persist(
        e.select(F.explode(F.array("u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias(src),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias(dst),
        )
    )


def triangle_counts(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    degree_orient: bool = True,
) -> DataFrame:
    """Per-vertex triangle membership: each triangle enumerates exactly
    once as (a,b)⋈(b,c)⋈(a,c) under an acyclic edge orientation — two
    shuffle joins on vertex keys, then an explode + hash agg. No
    driver-side graph state.

    By default edges are normalized (distinct, self-loops dropped) and
    re-oriented low-degree → high-degree (:func:`degree_oriented_edges`)
    so power-law hubs never anchor the wedge join; membership counts
    are orientation-independent, so results are identical to the plain
    ``src < dst`` orientation. ``degree_orient=False`` skips the two
    degree lookups but still normalizes (orient ``src < dst``, drop
    self-loops, distinct) — duplicate or reversed-duplicate edges would
    silently multiply counts, and a correctness precondition is never
    left to the caller; the distinct is one hash agg against the two
    wedge-join shuffles that follow."""
    if degree_orient:
        pairs = degree_oriented_edges(pairs, src, dst)
    else:
        pairs = (
            pairs.select(
                F.least(F.col(src), F.col(dst)).alias(src),
                F.greatest(F.col(src), F.col(dst)).alias(dst),
            )
            .filter(F.col(src) != F.col(dst))
            .distinct()
        )
    p1, p2, p3 = pairs.alias("p1"), pairs.alias("p2"), pairs.alias("p3")
    tri = (
        p1.join(p2, F.col(f"p2.{src}") == F.col(f"p1.{dst}"))
        .join(
            p3,
            (F.col(f"p3.{src}") == F.col(f"p1.{src}"))
            & (F.col(f"p3.{dst}") == F.col(f"p2.{dst}")),
        )
        .select(
            F.col(f"p1.{src}").alias("a"),
            F.col(f"p1.{dst}").alias("b"),
            F.col(f"p2.{dst}").alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """(id, core_degree) for every vertex of the k-core: the maximal
    subgraph where every vertex keeps degree >= k after iteratively
    peeling weaker vertices (fraud-ring / dense-dup-cluster extraction).

    Each round is one degree aggregate + two anti joins (drop edges
    touching peeled vertices), with eager localCheckpoint bounding the
    lineage — the same iterative shape as connected_components. Rounds
    needed = peeling depth (<= graph degeneracy ordering length; small
    for LSH dup graphs). Raises after ``max_iter`` rounds without
    convergence so the unrolled-CTE oracle (same round count) can never
    silently diverge. Input may contain duplicates/self-loops — the
    symmetrized edge set is de-duplicated and de-looped first.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .transform(track_local_checkpoint)
    )
    for _ in range(max_iter):
        deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("c"))
        weak = deg.filter(F.col("c") < k).select("a").transform(track_local_checkpoint)
        if weak.isEmpty():
            return deg.select(
                F.col("a").alias("id"), F.col("c").cast("bigint").alias("core_degree")
            )
        sym = (
            sym.join(weak.withColumnRenamed("a", "w"), F.col("a") == F.col("w"), "left_anti")
            .join(weak.withColumnRenamed("a", "w"), F.col("b") == F.col("w"), "left_anti")
        ).transform(track_local_checkpoint)
    raise RuntimeError(
        f"k_core did not converge within {max_iter} peeling rounds — "
        "raise max_iter (and the oracle's unroll count) for this graph"
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
) -> DataFrame:
    """Multi-source BFS over the symmetrized edge list: hop distance
    from the nearest seed, expanded for a fixed ``iters`` rounds
    (nodes further than ``iters`` hops are absent from the result —
    the bounded-radius contract that keeps lineage and cost constant).

    Frontier-based expansion (in unweighted BFS the FIRST discovery is
    the min distance, so only the newly-settled frontier needs to
    expand): per round one co-partitioned join (frontier x edges), one
    distinct, one anti-join against the settled set — each node's
    adjacency is scanned exactly once across the whole run, O(E) total
    instead of the naive min-union's O(E x iters). No driver-side
    state at all (cf. pagerank_fixed_point's node-count scalar).
    Distances are small exact integers, so results hash across engines
    with no fixed-point machinery. Frontier and settled frames are
    persisted per round — both are referenced twice and unbounded
    lineage would recompute 2^iters times."""
    from ..caching import track_persist

    sym = track_persist(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    settled = track_persist(seeds.select("id", F.lit(0).alias("dist")))
    frontier = settled
    for i in range(1, iters + 1):
        hop = (
            sym.join(frontier.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"))
            .distinct()
        )
        new = track_persist(
            hop.join(settled, "id", "left_anti").withColumn(
                "dist", F.lit(i)
            )
        )
        settled = track_persist(settled.unionByName(new))
        frontier = new
    return settled.select("id", F.col("dist").cast("long").alias("dist"))
