"""Operator tests for exact-integer distributed k-means
(operators/clustering.py). Cross-engine parity with the unrolled-CTE
oracle is covered by test_oracle_parity (q_kmeans_clusters); these pin
the operator-level contract: empty-cluster handling, tie-breaks,
agreement with an independent from-scratch reference, and the map-side
assignment plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vector_database_spark.operators.clustering import kmeans_micro


def _ref_kmeans(ids, emb, k, rounds):
    """From-scratch numpy reference: micro ints, floor-divide centroids,
    argmin with ties to the smaller cluster id, empty keeps previous."""
    mv = np.floor(np.asarray(emb, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)
    order = np.argsort(ids)
    ids_s, mv_s = np.asarray(ids)[order], mv[order]
    cent = mv_s[:k].copy()
    for _ in range(rounds):
        d = ((mv_s[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # np argmin: first min == smallest cid
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = np.floor_divide(mv_s[mask].sum(axis=0), mask.sum())
    d = ((mv_s[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return {
        int(i): (int(a), int(di))
        for i, a, di in zip(ids_s, d.argmin(axis=1), d.min(axis=1))
    }


def test_matches_independent_reference(spark):
    df = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    pdf = df.select("vec_id", "embedding").toPandas()
    ref = _ref_kmeans(pdf["vec_id"].to_numpy(), list(pdf["embedding"]), 8, 3)
    got = {r["vec_id"]: (r["cluster"], r["dist_sq"]) for r in kmeans_micro(df).collect()}
    assert got == ref


def test_all_clusters_populated_on_fixture(spark):
    df = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    sizes = (
        kmeans_micro(df)
        .groupBy("cluster")
        .count()
        .collect()
    )
    assert len(sizes) == 8
    assert sum(r["count"] for r in sizes) == df.count()


def test_empty_cluster_keeps_centroid(spark):
    # ids 0 and 1 are identical, so init centroids 0 and 1 coincide;
    # every point at that location ties and goes to cluster 0 (smaller
    # cid), leaving cluster 1 empty in EVERY round. The operator must
    # keep the stale centroid (not crash / not divide by zero) and
    # still assign all points to the surviving centroids.
    rows = [
        (0, [0.0, 0.0]), (1, [0.0, 0.0]),
        (2, [10.0, 10.0]), (3, [10.000001, 10.0]),
        (4, [0.0, 0.000001]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["cluster"] for r in kmeans_micro(df, k=3, rounds=2).collect()}
    assert set(out.values()) == {0, 2}
    assert out[0] == out[1] == out[4] == 0
    assert out[2] == out[3] == 2


def test_identical_points_tie_to_smallest_cluster(spark):
    rows = [(i, [1.0, 2.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_micro(df, k=3, rounds=1).collect()
    assert all(r["cluster"] == 0 and r["dist_sq"] == 0 for r in out)


def test_random_inputs_match_reference(spark):
    """Randomized agreement with the from-scratch reference on a coarse
    value grid (multiples of 0.25 — ties and duplicate points occur
    often, exercising the argmin tie-break and empty-cluster paths)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    grid = st.integers(min_value=-8, max_value=8).map(lambda q: q * 0.25)

    @settings(max_examples=5, deadline=None)
    @given(data=st.data())
    def prop(data):
        dim = data.draw(st.integers(2, 4))
        n = data.draw(st.integers(4, 16))
        k = data.draw(st.integers(2, min(4, n)))
        rounds = data.draw(st.integers(1, 3))
        vecs = data.draw(
            st.lists(
                st.lists(grid, min_size=dim, max_size=dim), min_size=n, max_size=n
            )
        )
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: (r["cluster"], r["dist_sq"])
            for r in kmeans_micro(df, k=k, rounds=rounds).collect()
        }
        ref = _ref_kmeans(list(range(n)), vecs, k, rounds)
        assert got == ref

    prop()


def test_semdedup_kmeans_finds_all_planted_copies(spark):
    """Identical vectors share their k-means cluster by construction, so
    verbatim copies can never be missed by the within-cluster verify."""
    from vector_database_spark.operators.clustering import semdedup_kmeans_pairs

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    copies = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding", "label"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in semdedup_kmeans_pairs(emb.unionByName(copies)).collect()
    }
    for i in range(30):
        assert (i, i + 5000) in pairs


def test_fewer_points_than_k_and_empty_input(spark):
    import pytest

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in kmeans_micro(df, k=5, rounds=2).collect()}
    # k clamps to n: each point becomes (and stays) its own centroid
    assert out[0]["cluster"] == 0 and out[1]["cluster"] == 1
    assert out[0]["dist_sq"] == 0 and out[1]["dist_sq"] == 0

    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="at least one"):
        kmeans_micro(empty)


def test_assignment_plan_is_map_side(spark):
    # The 100 TB contract: final assignment folds centroids in as
    # literals — no join anywhere, and the only exchange is the
    # presentation orderBy (plus AQE's reused stages if any).
    df = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    plan = kmeans_micro(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1  # rangepartitioning for orderBy only
