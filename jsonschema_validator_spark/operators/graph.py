"""Graph centrality over interaction/transition graphs — PageRank with
a FIXED iteration count, the batch-reproducible form: convergence-
threshold PageRank gives environment-dependent iteration counts, while
k fixed power-iteration steps from the uniform vector are a pure
function of the edge multiset and exactly replayable by a SQL oracle
(same reasoning as clustering.kmeans and preference.bradley_terry).

Reference parity note: outside the reference validator's scope
(macisamuele/jsonschema-validator validates keywords); this is the
analytics tier of SURVEY.md §2.

Scale: the raw event stream reduces to the weighted edge relation by
ONE groupBy(src, dst) — O(distinct edges), not O(rows). Each power
step is one join of the rank vector against the edge relation plus a
groupBy(dst): shuffles are on node keys, map-side combinable, and the
rank vector never leaves the cluster (no collect; dangling mass is a
single scalar aggregate per step, O(1) to the driver per iteration —
`iters` is small and fixed by contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank after exactly ``iters`` power steps from uniform.

    Edges with NULL endpoints are dropped; parallel edges (or the
    ``weight`` column) accumulate into one weighted edge. Out-edge
    weights are row-normalized into transition probabilities; the rank
    mass of dangling nodes (no out-edges) is redistributed uniformly
    each step, so total rank stays exactly 1:

        pr'(v) = (1-d)/N + d * (sum_u pr(u) P(v|u) + dangling/N)

    Returns (node, rank) with rank rounded to 6. Self-loops are kept
    (they are real transitions in a retry-heavy event stream and the
    oracle replays them identically).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .groupBy(F.col(src).cast("string").alias("__s"), F.col(dst).cast("string").alias("__d"))
        .agg(F.sum(w).alias("__w"))
    )
    out = e.groupBy("__s").agg(F.sum("__w").alias("__out"))
    trans = e.join(out, "__s").select(
        "__s", "__d", (F.col("__w") / F.col("__out")).alias("__p")
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return edges.sparkSession.createDataFrame([], "node string, rank double")
    base = (1.0 - damping) / n_nodes
    pr = nodes.withColumn("__pr", F.lit(1.0 / n_nodes))
    has_out = out.select(F.col("__s").alias("node")).distinct()
    for _ in range(iters):
        dangling = (
            pr.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("__pr"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        inflow = (
            pr.join(trans, pr["node"] == trans["__s"])
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum(F.col("__pr") * F.col("__p")).alias("__in"))
        )
        pr = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(base)
                + damping * (F.coalesce(F.col("__in"), F.lit(0.0)) + dangling / n_nodes)
            ).alias("__pr"),
        )
    return pr.select("node", F.round("__pr", 6).alias("rank"))
