#!/usr/bin/env python
"""Scale-stress probe for incremental batch-vs-corpus dedup
(operators/dedup.py::incremental_dedup) — appends to STRESS.md.

The production question: with a large already-ingested corpus, what does
near-dup-checking ONE arriving batch cost, and does it find everything?
Corpus: wide-vocab hash-synthesized docs (same generator family as
stress_dedup). Incoming batch: fixed 10k docs, 10% of which are verbatim
copies of corpus docs (must all be flagged), the rest novel.

Shape under test: cross-side band joins only — incoming-internal and
corpus-internal pairs never materialize, so candidate count tracks the
BATCH, not corpus². The corpus signature pass dominates wall here
because this probe recomputes it cold each time; production persists it
as an index (see the operator docstring), leaving only the batch-side
work. Both numbers are reported.

Usage: python tools/stress_incremental.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.stress_common import update_section  # noqa: E402
from vector_database_spark.operators import dedup  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402

VOCAB = 20_000
TOKENS_PER_DOC = 30
BATCH = 10_000
CORPUS_SIZES = [100_000, 500_000, 1_000_000]


def synth(spark, n_docs: int, id_offset: int = 0):
    return spark.range(n_docs).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)),
                lambda j: F.concat(
                    F.lit("t"),
                    F.pmod(F.xxhash64(F.col("id") + id_offset, j), F.lit(VOCAB)),
                ),
            ),
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark("stress_incremental")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        f"Corpus of N wide-vocab docs ({TOKENS_PER_DOC} tokens from "
        f"{VOCAB:,}); one arriving batch of {BATCH:,} docs, 10% verbatim",
        "corpus copies (planted; ids 10M+). Cross-side banding only: the",
        "candidate count tracks the batch, never corpus². `corpus sig s`",
        "is the cold signature pass production amortizes into a persisted",
        "index; `batch s` is the recurring per-batch cost.",
        "",
        "| corpus docs | candidates | flagged dups | planted found | corpus sig s | batch s |",
        "|---|---|---|---|---|---|",
    ]
    for n in CORPUS_SIZES:
        corpus = synth(spark, n).localCheckpoint(eager=True)
        n_planted = BATCH // 10
        # planted: copies of corpus docs 0..n_planted-1 at ids 10M+i
        planted = corpus.filter(F.col("doc_id") < n_planted).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
        novel = synth(spark, BATCH - n_planted, id_offset=20_000_000)
        incoming = planted.unionByName(novel).localCheckpoint(eager=True)

        # cold corpus pass, measured separately (production persists this
        # and hands it to the operator as corpus_sigs)
        t0 = time.perf_counter()
        corp_sigs = dedup.minhash_signatures(corpus).persist()
        corp_sigs.count()
        t_corpus = time.perf_counter() - t0

        # candidate count, via the same public banding API the operator
        # composes (the operator's output doesn't expose pre-verify pairs);
        # persist the batch signatures — band_keys references them once
        # per band
        inc_sigs = dedup.minhash_signatures(incoming).persist()
        n_cands = (
            dedup.band_keys(corp_sigs)
            .withColumnRenamed("bid", "id_a")
            .join(
                dedup.band_keys(inc_sigs).withColumnRenamed("bid", "id_b"),
                "band_key",
            )
            .select("id_a", "id_b")
            .distinct()
            .count()
        )
        inc_sigs.unpersist()

        # the SHIPPED operator, timed with the index precomputed
        t0 = time.perf_counter()
        verdict = dedup.incremental_dedup(
            incoming, corpus, corpus_sigs=corp_sigs
        ).persist()
        n_flagged = verdict.filter(F.col("is_dup")).count()
        t_batch = time.perf_counter() - t0

        found = verdict.filter(
            F.col("is_dup")
            & (F.col("doc_id") >= 10_000_000)
            & (F.col("doc_id") < 10_000_000 + n_planted)
        ).count()
        lines.append(
            f"| {n:,} | {n_cands:,} | {n_flagged:,} | {found}/{n_planted} "
            f"| {t_corpus:.1f} | {t_batch:.1f} |"
        )
        print(lines[-1])
        assert found == n_planted, "planted recall must be 100%"
        verdict.unpersist()
        corp_sigs.unpersist()

    update_section("Incremental batch-vs-corpus dedup", "\n".join(lines))
    print("STRESS.md updated")


if __name__ == "__main__":
    main()
