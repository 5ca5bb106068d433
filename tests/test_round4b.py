"""Tests for the round-4b operator batch (triangle counting, embedding
Gram screen, evaluation/stat additions)."""

from __future__ import annotations

import pytest


def test_triangle_count_k4_complete_graph(spark):
    from jsonschema_validator_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b],
        "src int, dst int",
    )
    rows = {r["node"]: r for r in triangle_count(edges).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert r["degree"] == 3
        assert r["triangles"] == 3  # each K4 vertex sits in C(3,2)=3 triangles
        assert r["local_cc"] == 1.0


def test_triangle_count_path_and_degree_one(spark):
    from jsonschema_validator_spark.operators.graph import triangle_count

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    rows = {r["node"]: r for r in triangle_count(edges).collect()}
    assert rows[2]["degree"] == 2 and rows[2]["triangles"] == 0
    assert rows[2]["local_cc"] == 0.0
    # degree-1 endpoints: C(1,2)=0 wedges -> local_cc undefined (NULL)
    assert rows[1]["local_cc"] is None and rows[3]["local_cc"] is None


def test_triangle_count_collapses_multi_edges_and_self_loops(spark):
    from jsonschema_validator_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (3, 1), (None, 2)],
        "src int, dst int",
    )
    rows = {r["node"]: r for r in triangle_count(edges).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r["triangles"] == 1 for r in rows.values())
    assert all(r["degree"] == 2 for r in rows.values())


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    from itertools import combinations

    from jsonschema_validator_spark.operators.graph import triangle_count

    # deterministic pseudo-random graph on 12 nodes
    pairs = [
        (a, b)
        for a, b in combinations(range(12), 2)
        if (a * 31 + b * 17) % 3 == 0
    ]
    adj = {n: set() for n in range(12)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    expected = {
        n: sum(
            1
            for x, y in combinations(sorted(adj[n]), 2)
            if y in adj[x]
        )
        for n in range(12)
        if adj[n]
    }
    edges = spark.createDataFrame(pairs, "src int, dst int")
    rows = {r["node"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert rows == expected


def test_gram_spectrum_collapsed_embeddings(spark):
    from jsonschema_validator_spark.operators.similarity import gram_spectrum

    # all vectors on one ray -> all trace mass in one direction
    rows = [([1.0 * (i % 3 + 1), 2.0 * (i % 3 + 1), 0.0, 0.0],) for i in range(20)]
    df = spark.createDataFrame(rows, "v array<double>")
    r = gram_spectrum(df, "v", dim=4).collect()[0]
    assert r["n_vecs"] == 20 and r["n_bad"] == 0
    assert r["top_share"] > 0.999
    assert r["collapsed"] is True
    assert abs(r["effective_rank"] - 1.0) < 1e-3


def test_gram_spectrum_isotropic_and_bad_rows(spark):
    from jsonschema_validator_spark.operators.similarity import gram_spectrum

    # 4 orthogonal directions, equal mass -> share ~ 1/4, plus bad rows
    rows = []
    for i in range(40):
        v = [0.0, 0.0, 0.0, 0.0]
        v[i % 4] = 2.0
        rows.append((v,))
    rows.append((None,))
    rows.append(([1.0, 2.0],))  # wrong length
    df = spark.createDataFrame(rows, "v array<double>")
    r = gram_spectrum(df, "v", dim=4).collect()[0]
    assert r["n_vecs"] == 40 and r["n_bad"] == 2
    assert abs(r["top_share"] - 0.25) < 1e-6
    assert r["collapsed"] is False
    assert abs(r["effective_rank"] - 4.0) < 1e-4


def test_gram_spectrum_empty_input(spark):
    from jsonschema_validator_spark.operators.similarity import gram_spectrum

    df = spark.createDataFrame([], "v array<double>")
    r = gram_spectrum(df, "v", dim=4).collect()[0]
    assert r["n_vecs"] == 0 and r["lambda_top"] is None
