#!/usr/bin/env python
"""Scale-stress probe for the per-bucket NSW graph ANN
(operators/ann.py::nsw_knn): recall@5 and wall time vs the exact
two-phase operator at growing corpus sizes and bucket counts
(appends to STRESS.md).

Embeddings are hash-deterministic 64-d (same generator family as
stress_semdedup); queries are 16 corpus vectors, so exact recall ground
truth includes the query itself (cos=1 — a correct top-1 the graph must
also find). The quantity of interest at scale is the per-bucket build
cost (linear in bucket size, amortized over the query batch) and that
recall holds as buckets multiply — the production layout builds each
bucket's graph ONCE at ingest.

Usage: python tools/stress_nsw.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.operators import ann, knn  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402
from tools.stress_common import update_section  # noqa: E402


def synth_embeddings(spark, n: int):
    comp = lambda j: (  # noqa: E731
        (F.pmod(F.hash(F.col("id"), F.lit(j)), F.lit(19)).cast("double") / 10.0)
        - 0.9
    )
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j) for j in range(64)]).cast("array<float>").alias("embedding"),
    )


def main() -> None:
    spark = get_spark("stress_nsw")
    spark.sparkContext.setLogLevel("ERROR")
    k = 5

    rows = []
    for n, n_buckets, ef in (
        (20_000, 8, 48),
        (100_000, 16, 48),
        (100_000, 32, 48),
        (500_000, 32, 48),
        (500_000, 32, 192),
    ):
        emb = synth_embeddings(spark, n).localCheckpoint(eager=True)
        queries = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") % (n // 16) == 0).collect()
        ]

        t0 = time.perf_counter()
        res = ann.nsw_knn(
            emb, queries, k=k, n_buckets=n_buckets, ef=ef, payload_cols=()
        ).collect()
        t_nsw = time.perf_counter() - t0

        by_q: dict[int, set[int]] = {}
        for r in res:
            by_q.setdefault(r["qid"], set()).add(r["vec_id"])

        t0 = time.perf_counter()
        hits = total = 0
        for qid, qv in queries:
            exact = {r["vec_id"] for r in knn.knn(emb, qv, k=k, payload_cols=()).collect()}
            hits += len(exact & by_q.get(qid, set()))
            total += k
        t_exact = time.perf_counter() - t0
        recall = hits / total

        rows.append((n, n_buckets, ef, recall, t_nsw, t_exact))
        print(
            f"n={n:,} buckets={n_buckets} ef={ef}: recall@5={recall:.2f} "
            f"nsw={t_nsw:.1f}s exact16q={t_exact:.1f}s"
        )

    body = "\n".join(
        f"| {n:,} | {b} | {e} | {r:.2f} | {tn:.1f} | {te:.1f} |"
        for n, b, e, r, tn, te in rows
    )
    update_section(
        "NSW graph ANN (per-bucket HNSW-class) vs exact",
        "Hash-deterministic 64-d vectors (uniform — the worst case for any\n"
        "ANN), 16 corpus-member queries, M=8 ef=48. One NSW graph per hash\n"
        "bucket, beam search per bucket, global merge; the exact column is\n"
        "16 sequential exact top-k scans (TakeOrderedAndProject) for\n"
        "contrast. Build+search\n"
        "are fused in this probe; a production layout builds graphs once\n"
        "at ingest and only pays beam search per query.\n\n"
        "Search beam `ef` is the recall knob: uniform-random data is the\n"
        "pathological case (no neighborhood structure for graph edges to\n"
        "exploit), and ef=192 buys back most of the 500k-row recall the\n"
        "default ef=48 loses there. ef_construction stays 64 throughout —\n"
        "the build cost is paid once at ingest in the production layout.\n\n"
        "| rows | buckets | ef | recall@5 | nsw build+search s | exact 16q s |\n"
        "|---|---|---|---|---|---|\n" + body,
    )
    print("STRESS.md updated")


if __name__ == "__main__":
    main()
