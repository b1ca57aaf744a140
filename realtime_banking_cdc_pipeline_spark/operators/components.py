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
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    ids = sym.select(F.col("a").alias("id"))
    if nodes is not None:
        ids = ids.unionByName(nodes.toDF("id"))
    labels = (
        ids.distinct().withColumn("label", F.col("id")).localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr = sym.join(labels.withColumnRenamed("id", "b"), "b").select(
            F.col("a").alias("id"), "label"
        )
        new = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        improved = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new
        if improved == 0:
            break
    else:
        # loop exhausted max_iter without reaching the fixpoint: labels
        # are NOT component minima (diameter > max_iter) — surface it
        # instead of returning silently-wrong clusters
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} rounds "
            f"({improved} labels still improving); component diameter "
            "exceeds max_iter — raise max_iter or use large-star/"
            "small-star for adversarially long chains",
            RuntimeWarning,
            stacklevel=2,
        )
    sym.unpersist()
    return labels.select("id", F.col("label").alias("component"))
