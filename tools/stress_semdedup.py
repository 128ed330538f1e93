#!/usr/bin/env python
"""Scale-stress probe for SemDeDup-shape clustered embedding dedup
(operators/dedup.py::semdedup_pairs) vs the exact all-pairs operator
(appends to STRESS.md).

Synthesizes hash-deterministic 64-d embeddings with PLANTED duplicates
(every 100th vector is a verbatim copy of the vector 50 ids earlier).
The bucketed operator must find every planted pair — identical vectors
always share their sign bucket — while only materializing within-bucket
pairs; the exact operator compares all N²/2 pairs and stops being
runnable long before the bucketed one breaks a sweat.

Usage: python tools/stress_semdedup.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.operators import dedup  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402
from tools.stress_common import update_section  # noqa: E402


def synth_embeddings(spark, n: int):
    """Deterministic 64-d embeddings in [-0.9, 0.9]; every 100th row
    copies the row 50 ids earlier (planted near-dup pairs, cos = 1).
    Components come from murmur hash of (id, j) — full per-id entropy, so
    sign buckets are well spread (a low-entropy generator here makes the
    whole corpus 19 identical vectors and the pair count quadratic)."""
    base = F.when(
        (F.col("id") % 100 == 0) & (F.col("id") >= 50), F.col("id") - 50
    ).otherwise(F.col("id"))
    comp = lambda j: (  # noqa: E731
        (F.pmod(F.hash(base, F.lit(j)), F.lit(19)).cast("double") / 10.0) - 0.9
    )
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j) for j in range(64)]).cast("array<float>").alias(
            "embedding"
        ),
    )


def main() -> None:
    spark = get_spark("stress_semdedup")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n, run_exact in ((20_000, True), (100_000, False), (500_000, False)):
        emb = synth_embeddings(spark, n).localCheckpoint(eager=True)
        planted = {
            (i - 50, i) for i in range(0, n, 100) if i >= 50
        }

        t0 = time.perf_counter()
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.semdedup_pairs(emb).collect()
        }
        t_bucket = time.perf_counter() - t0
        found = len(planted & got)

        t_exact = None
        if run_exact:
            t0 = time.perf_counter()
            dedup.embedding_neardup_pairs(emb).write.mode("overwrite").format(
                "noop"
            ).save()
            t_exact = time.perf_counter() - t0

        rows.append((n, len(planted), found, len(got), t_bucket, t_exact))
        print(
            f"n={n:,}: planted={len(planted)} found={found} "
            f"pairs={len(got)} bucket={t_bucket:.1f}s exact={t_exact}"
        )
        assert found == len(planted), "planted recall must be 100%"

    body = "\n".join(
        f"| {n:,} | {pl} | {fo} | {tot} | {tb:.1f} | "
        f"{'%.1f' % te if te is not None else 'not run (N²/2 pairs)'} |"
        for n, pl, fo, tot, tb, te in rows
    )
    update_section(
        "SemDeDup bucketed dedup vs exact all-pairs",
        "Hash-deterministic 64-d embeddings, every 100th vector a verbatim\n"
        "copy of the one 50 ids earlier. The sign-bucket operator finds\n"
        "100% of planted pairs while materializing only within-bucket\n"
        "candidates; the exact operator's N²/2 cross join is run only at\n"
        "20k rows (200M pairs) for contrast — at 500k it would be 125\n"
        "BILLION pairs.\n\n"
        "| rows | planted | found | total pairs | bucketed s | exact s |\n"
        "|---|---|---|---|---|---|\n" + body,
    )

    # ---- incremental shape: one arriving batch vs a standing corpus ----
    BATCH_NOVEL, BATCH_COPIES = 9_000, 1_000
    inc_rows = []
    for n in (100_000, 1_000_000):
        corpus = synth_embeddings(spark, n).localCheckpoint(eager=True)
        # novel arrivals: ids far past the corpus (distinct hash stream);
        # planted: verbatim copies of corpus ids 1..1000 (id +10M)
        novel = synth_embeddings(spark, 2 * n + BATCH_NOVEL).filter(
            F.col("vec_id") >= 2 * n
        )
        copies = corpus.filter(
            (F.col("vec_id") >= 1) & (F.col("vec_id") <= BATCH_COPIES)
        ).select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
        batch = novel.unionByName(copies).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        got = {
            (r["batch_id"], r["corpus_id"])
            for r in dedup.semdedup_incremental(batch, corpus).collect()
        }
        t_inc = time.perf_counter() - t0
        found = sum(
            1 for i in range(1, BATCH_COPIES + 1) if (i + 10_000_000, i) in got
        )
        inc_rows.append((n, found, len(got), t_inc))
        print(
            f"corpus={n:,}: planted={BATCH_COPIES} found={found} "
            f"pairs={len(got)} incremental={t_inc:.1f}s"
        )
        assert found == BATCH_COPIES, "planted recall must be 100%"

    inc_body = "\n".join(
        f"| {n:,} | {BATCH_NOVEL + BATCH_COPIES:,} | {fo}/{BATCH_COPIES} | {tot:,} | {t:.1f} |"
        for n, fo, tot, t in inc_rows
    )
    update_section(
        "Incremental semantic dedup (batch vs corpus)",
        "dedup.semdedup_incremental: a 10k-vector arriving batch (1,000\n"
        "verbatim copies of corpus vectors planted) checked against a\n"
        "standing corpus — cross-side sign-bucket pairs only, so the\n"
        "candidate count tracks the batch, never corpus². The corpus-side\n"
        "bucket projection is recomputed cold here (one map pass over the\n"
        "corpus — the wall-clock driver at 1M); a production pipeline\n"
        "keeps the corpus bucketed at rest (the catalog's LSH layout is\n"
        "exactly that shape), leaving only the batch-side work.\n\n"
        "| corpus rows | batch | planted found | cross pairs | s |\n"
        "|---|---|---|---|---|\n" + inc_body,
    )
    print("STRESS.md updated")


if __name__ == "__main__":
    main()
