"""Tree-structured transcript operators: depth + root resolution over
parent-pointer tables by POINTER DOUBLING.

Agent transcripts branch — retries, tool fan-out, tree-of-thought
exploration — so the production table often carries (turn_id,
parent_turn_id) rather than a flat (conv_id, turn_idx) order. The two
structural queries everything else builds on are "how deep is every
node" (for depth screens / truncation budgets) and "which root does
every node belong to" (the tree analog of the conversation key).

Scale shape — the whole point of this module: a naive one-step walk
(depth += 1 per join) costs O(max_depth) shuffles, unusable at
thousand-turn agent sessions; pointer doubling squares the hop length
each round (ptr' = ptr.ptr, dist' = dist + ptr.dist), so a depth-D
forest resolves in ceil(log2 D) self-joins — the same O(log n)-rounds
discipline as operators/dedup.connected_components (large-star /
small-star). Each round shuffles only (id, ptr, dist, root?) — payload
never rides along.

Cycles (corrupt parent pointers) cannot terminate the recursion; after
``max_iters`` (supports depth 2**max_iters) unresolved pointers raise
``TreeNotConverged`` listing sample offenders — a screen must fail
loudly on the corruption it exists to catch, never spin or silently
truncate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TreeNotConverged(RuntimeError):
    """Parent chains did not resolve within max_iters doubling rounds —
    a cycle, or a forest deeper than 2**max_iters."""


def tree_paths(
    df: DataFrame,
    id_col: str,
    parent_col: str,
    max_iters: int = 40,
) -> DataFrame:
    """(id, depth, root) for every node of a parent-pointer forest.

    Roots are rows with NULL parent (depth 0, root = self). A non-NULL
    parent that never appears as an id is an ORPHAN pointer — resolved
    nodes treat the dangling ancestor as a root-of-record is WRONG, so
    orphans raise ``TreeNotConverged`` too (referential integrity of
    the pointer column is operators/integrity.py's job; this operator
    refuses to guess).

    Pointer-doubling state per node: (ptr, dist, root) where ptr is the
    current known ancestor, dist the exact hop count to it, and root is
    set once ptr is a root. Each round joins the state to itself on
    ptr = id: resolved ancestors finalize root, unresolved ones double
    their reach. ceil(log2 depth) shuffles total.
    """
    state = df.select(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("ptr"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("dist"),
        F.when(F.col(parent_col).isNull(), F.col(id_col)).alias("root"),
        F.lit(False).alias("__orphan"),
    ).localCheckpoint(eager=True)
    pending_n = None  # unknown before the first count
    for _ in range(max_iters):
        row = state.agg(
            F.sum(F.col("root").isNull().cast("long")).alias("p"),
            F.sum(F.col("__orphan").cast("long")).alias("o"),
        ).first()
        if row["o"]:
            sample = [
                r["id"]
                for r in state.filter("__orphan").select("id").limit(5).collect()
            ]
            raise TreeNotConverged(
                f"parent pointers reference missing ids (orphans), e.g. {sample}"
            )
        pending_n = row["p"]
        if pending_n == 0:
            break
        anc = state.select(
            F.col("id").alias("__aid"),
            F.col("ptr").alias("__aptr"),
            F.col("dist").alias("__adist"),
            F.col("root").alias("__aroot"),
        )
        pending = state.filter(F.col("root").isNull())
        resolved = state.filter(F.col("root").isNotNull())
        # left join: a pending node whose ptr has no matching id is an
        # orphan — __adist stays NULL and the node can never resolve
        stepped = pending.join(anc, pending["ptr"] == anc["__aid"], "left").select(
            "id",
            F.coalesce("__aptr", "ptr").alias("ptr"),
            (F.col("dist") + F.col("__adist")).alias("dist"),
            F.when(F.col("__aroot").isNotNull(), F.col("__aroot")).alias("root"),
            F.col("__adist").isNull().alias("__orphan"),
        )
        # ONE materialization per round (cuts the exponentially-growing
        # lineage); the convergence/orphan counts above read the
        # checkpointed blocks, so each round costs one join job + one
        # cheap agg — not the 2-3 full recomputations a naive
        # isEmpty()-per-branch loop pays
        state = resolved.unionByName(stepped).localCheckpoint(eager=True)
    else:
        if pending_n is None or pending_n:
            sample = [
                r["id"]
                for r in state.filter(F.col("root").isNull())
                .select("id")
                .limit(5)
                .collect()
            ]
            if sample:
                raise TreeNotConverged(
                    f"nodes unresolved after {max_iters} doubling rounds "
                    f"(cycle or depth > 2**{max_iters}), e.g. {sample}"
                )
    return state.select("id", F.col("dist").alias("depth"), "root")


def branch_stats(
    df: DataFrame, id_col: str, parent_col: str
) -> DataFrame:
    """Per-root tree-shape rollup: n_nodes, max_depth, n_leaves,
    n_branch_points (nodes with >= 2 children — where the agent
    actually forked). One tree_paths resolution + one fan-out count;
    both aggregations are partial+final (skew-immune)."""
    paths = tree_paths(df, id_col, parent_col)
    fanout = (
        df.filter(F.col(parent_col).isNotNull())
        .groupBy(F.col(parent_col).alias("id"))
        .agg(F.count(F.lit(1)).alias("__children"))
    )
    nodes = paths.join(fanout, "id", "left").withColumn(
        "__children", F.coalesce("__children", F.lit(0))
    )
    return nodes.groupBy("root").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("depth").alias("max_depth"),
        F.sum((F.col("__children") == 0).cast("long")).alias("n_leaves"),
        F.sum((F.col("__children") >= 2).cast("long")).alias("n_branch_points"),
    )
