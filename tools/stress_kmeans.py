#!/usr/bin/env python
"""Scale-stress probe for exact-integer distributed k-means
(operators/clustering.py::kmeans_micro) — appends to STRESS.md.

Synthesizes hash-deterministic 64-d embeddings around k=8 PLANTED
centers (center j at 2*j on every axis, tight ±0.45 jitter). With
well-separated planted structure the clustering must recover it: every
planted group lands in one k-means cluster, and the probe asserts the
assignment is a perfect relabeling of the planted groups. Wall time
should scale ~linearly in rows: per round the assignment is map-side
(centroid literals) and the update shuffles only k*64 partial sums.

Usage: SPARK_DRIVER_MEMORY=48g python tools/stress_kmeans.py
(the 10M row needs the bigger heap: checkpointed floats + cached micro
ints ~8 GB together; the default 8g heap OOMs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.stress_common import update_section  # noqa: E402
from vector_database_spark.operators.clustering import kmeans_micro  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402


def synth_clustered(spark, n: int, k: int = 8):
    """id i belongs to planted group i%k; component j = 2*(i%k) + jitter,
    jitter in [-0.45, 0.45] from murmur hash of (id, j). Groups are >1.1
    apart on every axis, far beyond the jitter radius."""
    grp = F.pmod(F.col("id"), F.lit(k)).cast("double")
    comp = lambda j: (  # noqa: E731
        grp * 2.0
        + (F.pmod(F.hash(F.col("id"), F.lit(j)), F.lit(19)).cast("double") / 20.0)
        - 0.45
    )
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j) for j in range(64)]).cast("array<float>").alias("embedding"),
    )


def main() -> None:
    spark = get_spark("stress_kmeans")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: one tiny fit so the first measured row isn't JVM/codegen
    # startup (first probe run recorded 50k slower than 500k for that
    # reason)
    kmeans_micro(synth_clustered(spark, 5_000)).collect()

    rows = []
    for n in (50_000, 500_000, 2_000_000, 10_000_000):
        emb = synth_clustered(spark, n).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        got = (
            kmeans_micro(emb)
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.pmod(F.col("vec_id"), F.lit(8))).alias("n_groups"),
            )
            .collect()
        )
        wall = time.perf_counter() - t0
        # perfect recovery: 8 clusters, each holding exactly one planted
        # group (n/8 rows, 1 distinct planted-group id)
        assert len(got) == 8, got
        assert all(r["n"] == n // 8 and r["n_groups"] == 1 for r in got), got
        rows.append((n, wall))
        print(f"n={n:,}: clusters recover planted groups exactly, wall={wall:.1f}s")
        emb.unpersist()

    body = "\n".join(f"| {n:,} | {w:.1f} |" for n, w in rows)
    update_section(
        "Exact-integer k-means at scale",
        "Hash-deterministic 64-d embeddings around 8 planted centers\n"
        "(2.0 apart per axis, jitter ±0.45). kmeans_micro (k=8, 3 rounds)\n"
        "must recover the planted partition exactly; wall should be\n"
        "~linear in rows (map-side assignment + k*64-row update shuffle\n"
        "per round — driver state is 8×64 ints regardless of data size).\n"
        "Wall times are single runs on a shared host — run-to-run\n"
        "variance up to ~3x was observed (compare within one table, not\n"
        "across regenerations); the invariants are the EXACT planted\n"
        "recovery and monotone scaling to 10M rows.\n\n"
        "| rows | wall s |\n"
        "|---|---|\n" + body,
    )
    print("STRESS.md updated")


if __name__ == "__main__":
    main()
