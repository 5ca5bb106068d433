"""Round-4o batch 9: rank-biased overlap, degree assortativity."""

from __future__ import annotations

import numpy as np
import pytest


# --------------------------------------------------------------------- RBO


def _rbo_ref(rank_a, rank_b, p, depth):
    """Direct prefix-intersection replay."""
    s = 0.0
    for d in range(1, depth + 1):
        a = set(rank_a[:d])
        b = set(rank_b[:d])
        s += p ** (d - 1) * len(a & b) / d
    return (1 - p) * s


def test_rbo_identical_and_disjoint(spark):
    from jsonschema_validator_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    # identical rankings -> truncated RBO = (1-p) sum p^(d-1) = 1 - p^D
    rows = [(f"i{j}", float(100 - j), float(100 - j)) for j in range(30)]
    df = spark.createDataFrame(rows, "i string, sa double, sb double")
    row = rank_biased_overlap(
        df, "i", "sa", "sb", p=0.9, depth=30
    ).collect()[0]
    assert row["rbo"] == pytest.approx(1 - 0.9**30, abs=1e-5)

    # reversed scores on distinct halves -> top prefixes disjoint
    rows2 = [
        (f"i{j}", float(100 - j), float(j)) for j in range(40)
    ]
    df2 = spark.createDataFrame(rows2, "i string, sa double, sb double")
    row2 = rank_biased_overlap(
        df2, "i", "sa", "sb", p=0.9, depth=20
    ).collect()[0]
    ra = [f"i{j}" for j in range(40)]
    rb = list(reversed(ra))
    assert row2["rbo"] == pytest.approx(_rbo_ref(ra, rb, 0.9, 20), abs=1e-5)
    assert row2["rbo"] < 0.1  # heavy top-weight: disjoint tops ~ 0


def test_rbo_matches_reference_on_random_permutation(spark):
    from jsonschema_validator_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    rng = np.random.RandomState(4)
    n = 60
    sa = rng.permutation(n).astype(float)
    sb = sa + rng.normal(0, 5, n)  # correlated but shuffled ranking
    rows = [(f"i{j:03d}", float(sa[j]), float(sb[j])) for j in range(n)]
    df = spark.createDataFrame(rows, "i string, sa double, sb double")
    row = rank_biased_overlap(
        df, "i", "sa", "sb", p=0.8, depth=25
    ).collect()[0]
    # reference rankings with the same (score desc, item) tie-break
    ra = [i for i, _ in sorted(
        ((f"i{j:03d}", sa[j]) for j in range(n)),
        key=lambda kv: (-kv[1], kv[0]),
    )]
    rb = [i for i, _ in sorted(
        ((f"i{j:03d}", sb[j]) for j in range(n)),
        key=lambda kv: (-kv[1], kv[0]),
    )]
    assert row["rbo"] == pytest.approx(_rbo_ref(ra, rb, 0.8, 25), abs=1e-5)
    assert row["n_items"] == n


def test_rbo_groups_and_validation(spark):
    from jsonschema_validator_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    rows = [("g1", f"i{j}", float(j), float(j)) for j in range(10)] + [
        ("g2", f"i{j}", float(j), float(-j)) for j in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, i string, sa double, sb double")
    out = {
        r["g"]: r["rbo"]
        for r in rank_biased_overlap(
            df, "i", "sa", "sb", group="g", p=0.5, depth=10
        ).collect()
    }
    assert out["g1"] == pytest.approx(1 - 0.5**10, abs=1e-6)
    assert out["g2"] < out["g1"]
    with pytest.raises(ValueError):
        rank_biased_overlap(df, "i", "sa", "sb", p=1.5)


# ------------------------------------------------------------ assortativity


def test_assortativity_star_is_negative(spark):
    from jsonschema_validator_spark.operators.graph import (
        degree_assortativity,
    )

    # star: hub connected to 8 leaves -> perfectly disassortative
    rows = [("hub", f"leaf{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "src string, dst string")
    row = degree_assortativity(df).collect()[0]
    assert row["n_nodes"] == 9 and row["n_edges"] == 8
    assert row["assortativity"] == pytest.approx(-1.0, abs=1e-6)
    assert row["mean_degree"] == pytest.approx(16 / 9, abs=1e-6)


def test_assortativity_matches_numpy_pearson(spark):
    from jsonschema_validator_spark.operators.graph import (
        degree_assortativity,
    )

    rng = np.random.RandomState(11)
    edges = set()
    while len(edges) < 60:
        a, b = rng.randint(0, 25, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    rows = [(str(a), str(b)) for a, b in edges]
    df = spark.createDataFrame(rows, "src string, dst string")
    row = degree_assortativity(df).collect()[0]

    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    r = np.corrcoef(xs, ys)[0, 1]
    assert row["assortativity"] == pytest.approx(r, abs=1e-5)
    assert row["n_edges"] == 60 and row["n_nodes"] == len(deg)


def test_assortativity_regular_graph_null(spark):
    from jsonschema_validator_spark.operators.graph import (
        degree_assortativity,
    )

    # cycle: every node degree 2 -> zero variance -> NULL r
    n = 10
    rows = [(str(i), str((i + 1) % n)) for i in range(n)]
    df = spark.createDataFrame(rows, "src string, dst string")
    row = degree_assortativity(df).collect()[0]
    assert row["assortativity"] is None
    assert row["mean_degree"] == pytest.approx(2.0, abs=1e-9)
    # self-loops and duplicate edges collapse
    rows2 = rows + [("0", "0"), ("1", "0")]
    df2 = spark.createDataFrame(rows2, "src string, dst string")
    assert degree_assortativity(df2).collect()[0]["n_edges"] == n
