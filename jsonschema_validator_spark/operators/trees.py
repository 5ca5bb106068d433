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


def linearize_best_path(
    df: DataFrame,
    id_col: str,
    parent_col: str,
    score_col: str,
    max_iters: int = 40,
) -> DataFrame:
    """Collapse each tree to ONE root-to-leaf path — how a branched
    transcript becomes a linear training sequence: pick the
    highest-scoring leaf (ties to the smallest id, so the choice is a
    pure function of the data) and emit its full ancestry in root-first
    order.

    Plan: tree_paths resolves (root, depth) for every node in O(log
    depth) rounds; path EXTRACTION then groups by root and walks the
    chosen leaf's parent chain in one Arrow batch per tree — the same
    per-conversation-fits-in-a-worker assumption every conversation
    operator in this package already makes (a path is bounded by the
    context length, not the corpus). NULL scores never win unless the
    whole tree is unscored (coalesced below every real score).

    Output: (root, leaf_id, n_turns, path) with path the '->'-joined id
    chain root -> leaf.
    """
    import pandas as pd

    paths = tree_paths(df, id_col, parent_col, max_iters=max_iters)
    nodes = df.select(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("parent"),
        F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf"))).alias(
            "score"
        ),
    ).join(paths.select("id", "root"), "id")
    children = df.filter(F.col(parent_col).isNotNull()).select(
        F.col(parent_col).alias("id"), F.lit(True).alias("__has_child")
    ).distinct()
    nodes = nodes.join(children, "id", "left").withColumn(
        "__leaf", F.col("__has_child").isNull()
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        parent = dict(zip(pdf["id"], pdf["parent"]))
        leaves = pdf[pdf["__leaf"]]
        # argmax score, tie -> smallest id (deterministic)
        best = leaves.sort_values(["score", "id"], ascending=[False, True]).iloc[0]
        chain, cur = [], best["id"]
        while cur is not None and not pd.isna(cur):
            chain.append(int(cur))
            cur = parent.get(int(cur))
        chain.reverse()
        return pd.DataFrame(
            {
                "root": [chain[0]],
                "leaf_id": [int(best["id"])],
                "n_turns": [len(chain)],
                "path": ["->".join(str(c) for c in chain)],
            }
        )

    return nodes.groupBy("root").applyInPandas(
        pick, "root long, leaf_id long, n_turns int, path string"
    )


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
