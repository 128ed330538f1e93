#!/usr/bin/env python
"""Scale-stress probe for BPE learning/encoding (appends to STRESS.md).

BPE's distributed cost model: the merge loop runs on the WORD-TYPE table
(distinct words), so corpus growth only enters through the one-time
word-count pass and the final encode join — the per-round work is bounded
by vocabulary size. This probe synthesizes token-ish words over a 50k
word vocabulary (so types saturate and the claim is visible: 10× the
docs, ~flat learn time) and times 10 merge rounds + full-corpus encode.

Usage: python tools/stress_bpe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.operators import textops  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402
from tools.stress_common import update_section  # noqa: E402

VOCAB = 50_000
TOKENS_PER_DOC = 24


def synth_docs(spark, n_docs: int):
    # words like "w17345x" — letters only after the prefix digitization so
    # char-level BPE has structure to find
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), j), F.lit(VOCAB)).cast("string"),
                    F.lit("x"),
                ),
            ),
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark("stress_bpe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in (100_000, 1_000_000):
        docs = synth_docs(spark, n).localCheckpoint(eager=True)
        n_types = docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        ).distinct().count()

        t0 = time.perf_counter()
        merges = textops.bpe_learn(docs, n_merges=10)
        t_learn = time.perf_counter() - t0

        t0 = time.perf_counter()
        enc = textops.bpe_encode(docs, merges)
        total_subwords = enc.agg(F.sum("n_subwords")).collect()[0][0]
        t_encode = time.perf_counter() - t0

        rows.append((n, n_types, len(merges), t_learn, t_encode, total_subwords))
        print(
            f"n={n:,}: types={n_types:,} merges={len(merges)} "
            f"learn={t_learn:.1f}s encode={t_encode:.1f}s subwords={total_subwords:,}"
        )

    # incremental (compressed-dict) trainer at PRODUCTION merge depths on
    # the 1M-doc corpus: one word-freq collect, then the driver loop with
    # heap argmax — zero additional cluster jobs per merge. Merge-sequence
    # prefix must equal the distributed trainer's (BPE merges are
    # prefix-stable in n_merges).
    from vector_database_spark.operators import bpe

    t0 = time.perf_counter()
    wf_rows = [
        (r["word"], r["cnt"])
        for r in bpe.word_freq(docs)
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(bpe.DEFAULT_MAX_WORDS)
        .collect()
    ]
    t_collect = time.perf_counter() - t0
    inc_rows = []
    for depth in (1000, 8000):
        t0 = time.perf_counter()
        inc = bpe.train_bpe_from_freq(wf_rows, depth)
        t_train = time.perf_counter() - t0
        inc_rows.append((depth, len(inc), t_collect, t_train))
        print(
            f"incremental depth={depth}: merges={len(inc)} "
            f"collect={t_collect:.1f}s train={t_train:.1f}s"
        )
    assert inc[: len(merges)] == merges, "trainer prefix disagreement"

    # deep-table encode: the ordered replay pays O(table depth) per word
    # type (8k merges x 50k types is unusable); the rank-greedy strategy
    # is depth-independent — this is the full production tokenizer
    # pipeline end-to-end (collect + deep train + full-corpus encode)
    t0 = time.perf_counter()
    deep_subwords = (
        textops.bpe_encode(docs, inc, strategy="greedy")
        .agg(F.sum("n_subwords"))
        .collect()[0][0]
    )
    t_enc_deep = time.perf_counter() - t0
    print(
        f"deep encode (greedy, {len(inc):,} merges, 1M docs): "
        f"{t_enc_deep:.1f}s subwords={deep_subwords:,}"
    )

    body = "\n".join(
        f"| {n:,} | {ty:,} | {m} | {tl:.1f} | {te:.1f} | {sw:,} |"
        for n, ty, m, tl, te, sw in rows
    )
    inc_body = "\n".join(
        f"| {d:,} | {m:,} | {tc:.1f} | {tt:.1f} |" for d, m, tc, tt in inc_rows
    )
    # extrapolation derived from THIS run's measurement, never hardcoded
    # (a stale prose figure next to a regenerated table misled once)
    per_merge = rows[-1][3] / max(rows[-1][2], 1)
    hours_32k = per_merge * 32_000 / 3600
    update_section(
        "BPE learn/encode scaling (word-type-bound loop)",
        "24 tokens/doc over a 50k word vocabulary (hash-synthesized). The\n"
        "merge loop runs on the word-TYPE table, so once types saturate,\n"
        "10x the corpus costs ~the same learn time — only the initial\n"
        "word count and the final encode pass see the full corpus. Encode\n"
        "pays the merge fold once per word TYPE, broadcasts the\n"
        "word->pieces map, and maps token arrays through it map-side —\n"
        "ZERO shuffles (join fallback for >2M-type vocabularies is\n"
        "equivalence-tested).\n\n"
        "| docs | word types | merges | learn s | encode s | subwords |\n"
        "|---|---|---|---|---|---|\n" + body + "\n\n"
        "Incremental trainer (operators/bpe.py, r9) at PRODUCTION merge\n"
        "depths on the SAME 1M-doc corpus: ONE word-freq collect, then\n"
        "the driver loop (occurrence-indexed whole-word recounts +\n"
        "lazy-deletion heap argmax) — zero cluster jobs per merge, where\n"
        "the in-plan trainer above pays 2 jobs/merge (measured "
        f"{per_merge:.1f}s/merge at 1M docs => 32k merges would be\n"
        f"~{hours_32k:.0f} hours of round-trips; the incremental path\n"
        "makes vocabulary depth a driver-CPU cost instead).\n"
        "Merge-sequence prefix asserted equal to the distributed\n"
        "trainer's.\n\n"
        "| merge depth | merges learned | wf collect s | train s |\n"
        "|---|---|---|---|\n" + inc_body + "\n\n"
        f"Full-corpus encode with the {len(inc):,}-merge table via\n"
        "strategy='greedy' (rank-greedy per word type — depth-independent\n"
        "O(len²), where the ordered replay would pay the whole table per\n"
        f"type): {t_enc_deep:.1f}s over 1M docs, {deep_subwords:,} subwords\n"
        "— the complete production tokenizer pipeline (one corpus pass +\n"
        "driver train + vocab-bound encode), zero per-merge cluster jobs.",
    )
    print("STRESS.md updated")


if __name__ == "__main__":
    main()
