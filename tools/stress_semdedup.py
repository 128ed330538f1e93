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
    # phase selector: all | pairs | incremental | indexed — each phase
    # updates its own STRESS.md section, so they can run (and be re-run)
    # independently; the full sweep exceeds a 10-minute budget otherwise
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase not in ("all", "pairs", "incremental", "indexed"):
        raise SystemExit(
            f"unknown phase {phase!r}: pick all|pairs|incremental|indexed"
        )
    spark = get_spark("stress_semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    if phase in ("all", "pairs"):
        _pairs_phase(spark)
    if phase in ("all", "incremental"):
        _incremental_phase(spark)
    if phase in ("all", "indexed"):
        _indexed_phase(spark)
    print("STRESS.md updated")


def _pairs_phase(spark) -> None:
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


BATCH_NOVEL, BATCH_COPIES = 9_000, 1_000


def _incremental_phase(spark) -> None:
    # ---- incremental shape: one arriving batch vs a standing corpus ----
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
        "corpus — the wall-clock driver at 1M); the at-rest alternative is\n"
        "the next section's persisted-index probe.\n\n"
        "| corpus rows | batch | planted found | cross pairs | s |\n"
        "|---|---|---|---|---|\n" + inc_body,
    )


def _indexed_phase(spark) -> None:
    # ---- the at-rest shape: probe the persisted catalog LSH layout ----
    # (near_duplicates(use_index=True) — the batch hashes with the pinned
    # hyperplanes and joins the (table, sig) partitions; no corpus scan)
    import shutil
    import tempfile

    from vector_database_spark.catalog import Catalog

    n = 1_000_000
    root = tempfile.mkdtemp(prefix=f"stress_semdedup_ix_{os.getpid()}_")
    try:
        cat = Catalog(spark, root)
        col = cat.create_collection("c", dim=64, auto_compact=False)
        corpus = synth_embeddings(spark, n)
        t0 = time.perf_counter()
        col.upsert(
            corpus.select(
                F.col("vec_id").alias("id"),
                "embedding",
                F.create_map(F.lit("k"), F.lit("v")).alias("payload"),
            )
        )
        t_ingest = time.perf_counter() - t0
        t0 = time.perf_counter()
        col.build_lsh_index()
        t_build = time.perf_counter() - t0

        novel = synth_embeddings(spark, 2 * n + BATCH_NOVEL).filter(
            F.col("vec_id") >= 2 * n
        )
        copies = corpus.filter(
            (F.col("vec_id") >= 1) & (F.col("vec_id") <= BATCH_COPIES)
        ).select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
        batch = (
            novel.unionByName(copies)
            .select(F.col("vec_id").alias("id"), "embedding")
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        got_ix = {
            (r["batch_id"], r["corpus_id"])
            for r in col.near_duplicates(batch, use_index=True).collect()
        }
        t_probe = time.perf_counter() - t0
        found_ix = sum(
            1
            for i in range(1, BATCH_COPIES + 1)
            if (i + 10_000_000, i) in got_ix
        )
        print(
            f"indexed probe at {n:,}: ingest={t_ingest:.1f}s "
            f"build_lsh={t_build:.1f}s probe={t_probe:.1f}s "
            f"planted={found_ix}/{BATCH_COPIES} pairs={len(got_ix)}"
        )
        assert found_ix == BATCH_COPIES, "exact copies collide in every table"
        update_section(
            "Incremental semantic dedup — at-rest index probe",
            f"near_duplicates(use_index=True) on a 1M-point collection:\n"
            f"one-time ingest {t_ingest:.1f}s + build_lsh_index "
            f"{t_build:.1f}s,\nthen the 10k-batch probe costs "
            f"**{t_probe:.1f}s** ({found_ix}/{BATCH_COPIES}\nplanted exact "
            f"copies found — they collide in every table;\n"
            f"{len(got_ix):,} verified pairs). Norm-tagged single-fold\n"
            f"scoring cut this 2.4× (226s with per-pair cosine folds).\n\n"
            f"Honest crossover vs the scan variant (2.0s at this corpus):\n"
            f"the probe verifies ~batch × tables × bucket-rows candidates\n"
            f"(10k × 4 × ~3.9k ≈ 156M folds here) but NEVER scans the\n"
            f"corpus, and the auto layout width holds bucket rows ~4096 as\n"
            f"the collection grows — probe cost is ~FLAT in corpus size\n"
            f"while the sign-bucket scan's one map pass grows linearly\n"
            f"(~2s/1M rows). Extrapolated crossover ≈ 50-100M rows; below\n"
            f"it use the default scan path, above it (the 100 TB regime)\n"
            f"the probe is the only shape that doesn't touch the corpus,\n"
            f"and refresh_lsh_index keeps coverage at O(write batch)\n"
            f"between folds.",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
