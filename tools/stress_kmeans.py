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

Usage: python tools/stress_kmeans.py — runs at the DEFAULT heap.
(Earlier revisions needed SPARK_DRIVER_MEMORY=48g: the synth floats were
localCheckpoint'ed and the micro ints cached DESERIALIZED, ~8 GB of raw
data as ~30+ GB of java objects on the one local JVM. Now the input is
persisted DISK_ONLY and the k-means projection is NOT cached at all
(storage_level=False — DataFrame caching's per-task columnar builders
alone OOM'd 8g at 10M rows even at disk-backed levels), so local heap
holds only the per-task working set — the shape a real cluster sees,
where recompute-over-cache is the normal call for a cheap map-only
projection.)
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

    from pyspark.storagelevel import StorageLevel

    rows = []
    for n in (50_000, 500_000, 2_000_000, 10_000_000):
        # DISK_ONLY: pins the synth cost outside the measured window (like
        # the old localCheckpoint) without holding n×64 floats as java
        # objects on the local JVM heap.
        emb = synth_clustered(spark, n).persist(StorageLevel.DISK_ONLY)
        emb.count()
        t0 = time.perf_counter()
        got = (
            # storage_level=False: no projection cache at all — DataFrame
            # caching's per-task columnar builders OOM the default local
            # heap at 10M wide-array rows (see the kmeans_micro
            # docstring); the projection recomputes from the DISK_ONLY
            # input, one linear read per round
            kmeans_micro(emb, storage_level=False)
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
        "Runs at the DEFAULT 8g local heap: input DISK_ONLY, projection\n"
        "uncached (storage_level=False) — no SPARK_DRIVER_MEMORY override.\n"
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
