"""Round-4 additions: distributed Lloyd k-means (operators/clustering)
and Bloom semi-join-reduced referential integrity (operators/integrity
bloom_*). Both are checked for exact-result invariants — the Bloom must
change the PLAN, never the ANSWER, and k-means must be deterministic
and partition-order independent."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------- bloom


def _parent_child(spark):
    parent = spark.range(0, 500).select((F.col("id") * 3).alias("k"))
    # children 0..1499: only multiples of 3 have parents
    child = spark.range(0, 1500).select(F.col("id").alias("k"), (F.col("id") % 7).alias("payload"))
    return parent, child


def test_bloom_orphans_equals_plain_anti_join(spark):
    from jsonschema_validator_spark.operators.integrity import bloom_orphans, orphans

    parent, child = _parent_child(spark)
    got = sorted(tuple(r) for r in bloom_orphans(child, parent, "k").collect())
    want = sorted(tuple(r) for r in orphans(child, parent, "k").collect())
    assert got == want
    assert len(got) == 1000  # non-multiples of 3


def test_bloom_no_false_negatives_and_prunes(spark):
    """Every parent key must probe TRUE (no false negatives — the
    correctness contract), and the candidate branch must be a strict
    subset of the child (the pruning that justifies the operator)."""
    from jsonschema_validator_spark.operators.integrity import (
        bloom_might_contain,
        build_bloom,
    )

    parent, child = _parent_child(spark)
    words = build_bloom(parent, "k", n_bits=1 << 14, n_hashes=4)
    might = bloom_might_contain(F.col("k"), words, 1 << 14, 4)
    # no false negatives: every true member probes present
    n_members_missed = parent.filter(~might).count()
    assert n_members_missed == 0
    # pruning: most true orphans are screened out without the join
    n_candidates = child.filter(might).count()
    assert n_candidates < child.count()
    # with 500 keys in 16 Kib the FP rate is tiny: candidates ~ members
    assert n_candidates <= 500 + 50


def test_bloom_null_keys_are_orphans(spark):
    """left_anti never matches NULL keys; the bloom path must agree."""
    from jsonschema_validator_spark.operators.integrity import bloom_orphans, orphans

    parent = spark.range(0, 10).select(F.col("id").alias("k"))
    child = spark.createDataFrame(
        [(0, "a"), (None, "b"), (99, "c"), (None, "d")], "k long, payload string"
    )
    got = sorted((r["payload"]) for r in bloom_orphans(child, parent, "k").collect())
    want = sorted((r["payload"]) for r in orphans(child, parent, "k").collect())
    assert got == want == ["b", "c", "d"]


def test_bloom_word_table_is_bounded(spark):
    from jsonschema_validator_spark.operators.integrity import build_bloom

    parent = spark.range(0, 100).select(F.col("id").alias("k"))
    words = build_bloom(parent, "k", n_bits=1 << 10, n_hashes=4)
    assert len(words) == (1 << 10) // 64
    assert any(w != 0 for w in words)


# --------------------------------------------------------------- kmeans


def _vec_df(spark, n=60, dim=4, shift=0):
    # three well-separated blobs on a lattice — no RNG, no ties
    rows = []
    for i in range(n):
        blob = i % 3
        base = [blob * 10.0] * dim
        rows.append((i + shift, [base[d] + ((i * (d + 1)) % 5) * 0.1 for d in range(dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_planted_blobs(spark):
    from jsonschema_validator_spark.operators.clustering import kmeans

    df = _vec_df(spark)
    assigned, cents = kmeans(df, "vec_id", "embedding", k=3, iters=3)
    rows = assigned.select("vec_id", "cluster").collect()
    # every blob lands in exactly one cluster and clusters don't mix
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3
    assert len(cents) == 3


def test_kmeans_partition_order_independent(spark):
    from jsonschema_validator_spark.operators.clustering import kmeans_summary

    df = _vec_df(spark)
    a = [tuple(r) for r in kmeans_summary(df, "vec_id", "embedding", k=3, iters=2).collect()]
    b = [
        tuple(r)
        for r in kmeans_summary(
            df.repartition(7, "vec_id"), "vec_id", "embedding", k=3, iters=2
        ).collect()
    ]
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k larger than the number of distinct points: the surplus
    centroid keeps its init vector instead of crashing or NaN-ing."""
    from jsonschema_validator_spark.operators.clustering import kmeans

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [10.0, 10.0])],
        "vec_id long, embedding array<double>",
    )
    assigned, cents = kmeans(df, "vec_id", "embedding", k=3, iters=2)
    assert assigned.count() == 3
    assert len(cents) == 3
    assert all(all(x == x for x in c) for _, c in cents)  # no NaN


def test_kmeans_assignment_tie_breaks_to_lowest_cluster(spark):
    from jsonschema_validator_spark.operators.clustering import assign_nearest

    df = spark.createDataFrame([(7, [5.0])], "vec_id long, embedding array<double>")
    cents = [(0, [0.0]), (1, [10.0])]  # equidistant from 5.0
    r = assign_nearest(df, "vec_id", "embedding", cents).collect()[0]
    assert r["cluster"] == 0


def test_cube_profile_marginals_consistent(spark):
    from jsonschema_validator_spark.operators.stats import cube_profile

    df = spark.createDataFrame(
        [("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 4.0)], "d1 string, d2 string, m double"
    )
    rows = {(r["d1"], r["d2"], r["gid"]): (r["n"], r["total"]) for r in cube_profile(df, ["d1", "d2"], "m").collect()}
    assert rows[(None, None, 3)] == (3, 7.0)  # grand total
    assert rows[("A", None, 1)] == (2, 3.0)  # d2 rolled up
    assert rows[(None, "x", 2)] == (2, 5.0)  # d1 rolled up
    assert rows[("A", "x", 0)] == (1, 1.0)  # raw cell


@pytest.mark.parametrize("iters", [0, 1])
def test_kmeans_iters_monotone_inertia(spark, iters):
    """Lloyd never increases inertia: iters+1 total inertia <= iters."""
    from jsonschema_validator_spark.operators.clustering import kmeans_summary

    df = _vec_df(spark)

    def inertia(it):
        return sum(
            r["inertia"] for r in kmeans_summary(df, "vec_id", "embedding", k=3, iters=it).collect()
        )

    assert inertia(iters + 1) <= inertia(iters) + 1e-9


# -------------------------------------------------------- seq grammar


def test_sequence_string_orders_and_tiebreaks(spark):
    import datetime

    from jsonschema_validator_spark.operators.conversation import sequence_string

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("u1", t0, 2, "beta"),
        ("u1", t0, 1, "alpha"),  # same ts: tiebreak on id
        ("u1", datetime.datetime(2024, 1, 2), 3, "gamma"),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, id long, tok string")
    out = sequence_string(df, "g", "ts", "tok", tiebreak="id").collect()[0]
    assert out["seq"] == "abg"
    assert out["n_turns"] == 3


def test_grammar_report_pattern_combinations(spark):
    import datetime

    from jsonschema_validator_spark.operators.conversation import grammar_report

    t = lambda i: datetime.datetime(2024, 1, 1, i)
    rows = (
        [("good", t(i), i, x) for i, x in enumerate(["signup", "click", "purchase"])]
        + [("bad", t(i), i, x) for i, x in enumerate(["error", "error", "click"])]
    )
    df = spark.createDataFrame(rows, "g string, ts timestamp, id long, tok string")
    out = {
        (r["starts_clean"], r["has_error_run"]): r["n_groups"]
        for r in grammar_report(
            df, "g", "ts", "tok", {"starts_clean": "^[sv]", "has_error_run": "ee"}, tiebreak="id"
        ).collect()
    }
    assert out == {(True, False): 1, (False, True): 1}
