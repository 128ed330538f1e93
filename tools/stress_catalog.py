#!/usr/bin/env python
"""Collection-lifecycle stress at 1M points (appends to STRESS.md).

The catalog API (the Qdrant-parity surface) is oracle-tested at fixture
size; this probe runs the full LIFECYCLE a production collection sees, at
1M points, and records each stage's wall clock:

  create → 4 × 250k log-structured upserts → count → exact search →
  IVF index build → pruned search → 100k point UPDATE (re-upsert) →
  100k DELETE (tombstones) → compact → exact search again

and asserts the semantics survive scale:

  * count reflects latest-wins minus tombstones at every step
  * an updated point is served with its NEW vector (latest-wins)
  * the exact top-5 BEFORE compact equals the top-5 AFTER compact
    bit-for-bit (compaction is a physical fold, never a semantic change)
  * the IVF-pruned search's recall vs exact is reported next to its
    speedup (uniform random vectors — the ANN worst case)

Usage: python tools/stress_catalog.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.catalog import Catalog  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402

N_POINTS = 1_000_000
N_BATCHES = 4
DIM = 32
K = 5


def synth_points(spark, lo: int, hi: int, bump: float = 0.0):
    """(id, embedding, payload) rows, hash-derived — no driver data. The
    leading +1.0 component guarantees a nonzero norm (cosine ingest
    validates); ``bump`` perturbs the vector so an UPDATE is observable."""
    return spark.range(lo, hi).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: F.when(j == 0, F.lit(1.0 + bump)).otherwise(
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast("double")
                / 1000.0
                - 0.5
                + bump
            ),
        )
        .cast("array<float>")
        .alias("embedding"),
        F.create_map(
            F.lit("label"), F.pmod(F.col("id"), F.lit(8)).cast("string")
        ).alias("payload"),
    )


def main() -> None:
    spark = get_spark("stress-catalog")
    root = "/tmp/stress_catalog_root"
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(spark, root)
    col = cat.create_collection("bulk", dim=DIM, metric="cosine")
    qv = [float(x) for x in synth_points(spark, 0, 1).first()["embedding"]]

    lines = [
        f"{N_POINTS:,} points, {DIM}-d, cosine, hash-synthesized. Full",
        "lifecycle on the collection API; counts and search results are",
        "asserted at each step (latest-wins, tombstones, compaction fold).",
        "",
        "| stage | wall s | state |",
        "|---|---|---|",
    ]

    def stage(name, fn):
        t0 = time.perf_counter()
        state = fn()
        t = time.perf_counter() - t0
        lines.append(f"| {name} | {t:.1f} | {state} |")
        print(lines[-1])
        return state

    per = N_POINTS // N_BATCHES
    for b in range(N_BATCHES):
        stage(
            f"upsert batch {b + 1} ({per:,} pts)",
            lambda b=b: f"version {col.upsert(synth_points(spark, b * per, (b + 1) * per))}",
        )
    stage("count", lambda: f"{col.count():,} points")
    assert col.count() == N_POINTS

    exact1 = stage(
        f"exact search top-{K}",
        lambda: [(r["id"], r["score"]) for r in col.search(qv, limit=K).collect()],
    )

    stage("build_ivf_index (64 centroids)", lambda: col.build_ivf_index(n_centroids=64) or "built")
    ivf_ids = stage(
        f"search_ivf top-{K} (nprobe=8)",
        lambda: [r["id"] for r in col.search_ivf(qv, limit=K, nprobe=8).collect()],
    )
    recall = len(set(ivf_ids) & {i for i, _ in exact1}) / K
    lines.append(f"| ivf recall vs exact | — | {recall:.2f} @ nprobe 8/64 |")
    print(lines[-1])

    # UPDATE: re-upsert 100k points with perturbed vectors — latest wins
    stage(
        "update 100k points (re-upsert)",
        lambda: f"version {col.upsert(synth_points(spark, 0, 100_000, bump=0.25))}",
    )
    got = col.get(1)
    assert abs(got["embedding"][0] - 1.25) < 1e-6, "update not served latest-wins"

    # DELETE: 100k other ids via tombstones (no rewrite)
    stage(
        "delete 100k points (tombstones)",
        lambda: f"version {col.delete(point_ids=spark.range(100_000, 200_000))}",
    )
    assert col.count() == N_POINTS - 100_000

    exact2 = [(r["id"], r["score"]) for r in col.search(qv, limit=K).collect()]
    stage("compact (fold history)", lambda: col.compact() or "folded")
    assert col.count() == N_POINTS - 100_000
    exact3 = stage(
        f"exact search top-{K} after compact",
        lambda: [(r["id"], r["score"]) for r in col.search(qv, limit=K).collect()],
    )
    assert exact2 == exact3, "compaction changed search results"

    # ---- graph-index serving at scale (r7): the search_auto_batch shape --
    # one-time NSW build over the live 900k points (64 buckets ≈ 14k
    # rows/bucket — the segment-sized graphs the batch stress uses), then
    # the AUTO router must pick it and serve a 16-query batch in one pass.
    stage(
        "build_nsw_index (64 buckets, one-time ingest cost)",
        lambda: col.build_nsw_index(n_buckets=64) or "built",
    )
    assert col.route_for_search() == "nsw"
    queries = [
        (int(r["id"]), [float(x) for x in r["embedding"]])
        for r in col.df().filter(F.col("id") % 60_000 == 3).limit(16).collect()
    ]
    batch_holder: dict = {}

    def _run_batch():
        rows = col.search_auto_batch(queries, limit=K).collect()
        batch_holder["rows"] = rows
        return f"{len(rows)} rows (16 x top-{K})"

    stage("search_auto_batch (16 queries, NSW route)", _run_batch)
    batch_rows = batch_holder["rows"]
    by_q: dict[int, set] = {}
    for r in batch_rows:
        by_q.setdefault(r["qid"], set()).add(r["id"])
    assert len(batch_rows) == K * len(queries)
    assert set(by_q) == {qid for qid, _ in queries}
    t0 = time.perf_counter()
    hits = 0
    for qid, q in queries:
        exact_ids = {r["id"] for r in col.search(q, limit=K).collect()}
        hits += len(exact_ids & by_q[qid])
    t_exact16 = time.perf_counter() - t0
    recall_b = hits / (K * len(queries))
    lines.append(
        f"| auto-batch recall vs 16 exact scans | {t_exact16:.1f} (exact) "
        f"| {recall_b:.2f} @ ef=auto |"
    )
    print(lines[-1])

    lines += [
        "",
        "Upserts are append-only versioned Parquet (no rewrite until",
        "compact); deletes are tombstone appends; the exact search is",
        "TakeOrderedAndProject over the latest-wins view, identical before",
        "and after the compaction fold. The IVF search prunes to 8/64",
        "centroid partitions — its recall/speedup trade on worst-case",
        "uniform vectors is recorded above (clustered corpora hold recall",
        "1.00 at a 3% scan fraction — see the IVF operating curve).",
        "The final stages are the serving shape at scale: the NSW graph",
        "build is the one-time ingest cost (64 segment-sized buckets,",
        "applyInPandas build, id-list adjacency persisted next to the",
        "vectors), after which the auto router serves whole query batches",
        "from the persisted layout in one bucket pass — wall clock and",
        "recall recorded above; the 16.3x batch-vs-sequential split is in",
        "'Batch index search at 1M rows'.",
    ]
    from tools.stress_common import update_section

    update_section("Collection lifecycle at 1M points", "\n".join(lines))
    print("updated STRESS.md section: Collection lifecycle at 1M points")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
