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

    saturated_corpus(spark)


def saturated_corpus(spark) -> None:
    """r11 acceptance for incremental_dedup_auto: a SATURATED corpus
    (small fixed vocabulary — the template-farm regime of
    stress_minhash_auto) makes fixed (8,4) cross-side banding explode
    per batch; the auto operator's probe must bound the candidates via
    band-widening against the wide index, with planted verbatim copies
    still 100% found (J=1 collides at every level)."""
    import warnings

    n, vocab, toks_per_doc = 500_000, 500, 20

    def synth_small_vocab(n_docs: int, id_offset: int = 0):
        return spark.range(n_docs).select(
            (F.col("id") + id_offset).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(toks_per_doc)),
                    lambda j: F.concat(
                        F.lit("t"),
                        F.pmod(
                            F.xxhash64(F.col("id") + id_offset, j),
                            F.lit(vocab),
                        ),
                    ),
                ),
            ).alias("text"),
        )

    corpus = synth_small_vocab(n).localCheckpoint(eager=True)
    n_planted = 1_000
    planted = corpus.filter(F.col("doc_id") < n_planted).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    novel = synth_small_vocab(BATCH - n_planted, id_offset=20_000_000)
    incoming = planted.unionByName(novel).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    idx = dedup.minhash_index_signatures(corpus).persist()
    idx.count()
    counts = dedup.minhash_index_band_counts(idx).persist()
    counts.count()
    t_index = time.perf_counter() - t0

    lines = [
        f"{n:,}-doc SATURATED corpus ({toks_per_doc} tokens from a fixed",
        f"{vocab}-token vocabulary — the template-farm regime); one",
        f"{BATCH:,}-doc batch with {n_planted:,} planted verbatim corpus",
        "copies. Wide 32-hash index (minhash_index_signatures) + its",
        "probe-side band-count companion (minhash_index_band_counts)",
        f"built once in {t_index:.1f}s; 'fixed' is incremental_dedup",
        "against the index's h0..h7 prefix, 'auto' is",
        "incremental_dedup_auto at the 2M default budget with the counts",
        "table (without it the probes re-aggregate the full index per",
        "batch). Candidates = the cross-side band join's pre-distinct",
        "row count (what the probe bounds).",
        "",
        "| plan | hashes x bands | candidates | batch s | planted found |",
        "|---|---|---|---|---|",
    ]
    for label in ("fixed", "auto"):
        stats: dict = {}
        t0 = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            if label == "fixed":
                verdict = dedup.incremental_dedup(
                    incoming, corpus, corpus_sigs=idx
                ).persist()
            else:
                verdict = dedup.incremental_dedup_auto(
                    incoming, corpus, corpus_index=idx,
                    corpus_band_counts=counts, stats=stats,
                ).persist()
        verdict.count()
        wall = time.perf_counter() - t0
        found = verdict.filter(
            F.col("is_dup") & (F.col("doc_id") >= 10_000_000)
        ).count()
        verdict.unpersist()
        if label == "fixed":
            first = dedup.MINHASH_ESCALATION_LEVELS[0]
            chosen, cand = first, dedup._cross_volumes(
                idx, dedup.minhash_index_signatures(incoming), "doc_id", [first]
            )[0]
        else:
            chosen = (stats["num_hashes"], stats["bands"])
            cand = stats["volumes"][-1]
            assert stats["level"] > 0, "saturated corpus must escalate"
        lines.append(
            f"| {label} | {chosen[0]}x{chosen[1]} | {cand:,} | "
            f"{wall:.1f} | {found}/{n_planted} |"
        )
        print(lines[-1])
        assert found == n_planted, "planted verbatim recall must be 100%"
    idx.unpersist()
    counts.unpersist()
    lines += [
        "",
        "Reading: every arriving batch against a saturated corpus pays",
        "the candidate explosion AGAIN under fixed banding — the",
        "auto operator re-prices it per batch with probe jobs that join",
        "the batch's tiny count table against the persisted band-count",
        "companion (never re-aggregating the index), then widens banding",
        "against the wide index columns (no corpus text re-read, no",
        "re-index). Verbatim",
        "copies collide at every level; the widening trade (mid-Jaccard",
        "recall narrows) is the module-constant doc's, and the warning",
        "names the at-ingest re-index (DF-filtered text) as the fix for",
        "corpora that live in this regime.",
    ]
    update_section(
        "Incremental dedup vs a saturated corpus (r11)", "\n".join(lines)
    )
    print("updated STRESS.md section: Incremental dedup vs a saturated corpus")


if __name__ == "__main__":
    main()
