#!/usr/bin/env python
"""Scale-stress probe for unigram-LM tokenizer training (appends to
STRESS.md).

Cost model under test (operators/unigram_lm.py): the corpus enters ONCE
through the word-frequency pass; every EM E-step and every prune's
Viterbi-usage pass is one distributed job over the WORD-TYPE table with
the vocabulary broadcast — so once types saturate, 10× the corpus costs
~the same train time, exactly the BPE claim, but with ~15 type-table
jobs instead of a driver loop. The probe reuses stress_bpe's synthetic
corpus (24 tokens/doc over a 50k word vocabulary) so the two trainers'
rows are directly comparable, times the full train at 100k and 1M docs,
breaks out per-phase cost at 1M, and asserts the 100k/1M vocabularies
only differ where frequencies do (determinism is already pinned by
tests; this is the scale check).

Usage: python tools/stress_unigram.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.operators import unigram_lm  # noqa: E402
from vector_database_spark.operators.textops import word_freq  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402
from tools.stress_bpe import synth_docs  # noqa: E402
from tools.stress_common import update_section  # noqa: E402

VOCAB_SIZE = 1_000
SEED_SIZE = 4_000
MAX_PIECE_LEN = 6


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "scaling"
    if phase not in ("scaling", "wide"):
        raise SystemExit(f"unknown phase {phase!r}: pick scaling|wide")
    spark = get_spark("stress_unigram")
    spark.sparkContext.setLogLevel("ERROR")
    if phase == "wide":
        _wide_phase(spark)
        return

    rows = []
    models = {}
    for n in (100_000, 1_000_000):
        docs = synth_docs(spark, n).localCheckpoint(eager=True)
        wf = word_freq(docs).persist()
        n_types = wf.count()

        t0 = time.perf_counter()
        pieces, logp = unigram_lm._seed_from_wf(wf, SEED_SIZE, MAX_PIECE_LEN)
        t_seed = time.perf_counter() - t0

        t0 = time.perf_counter()
        counts, _ = unigram_lm._em_pass(wf, pieces, logp, MAX_PIECE_LEN)
        t_em1 = time.perf_counter() - t0
        pieces, logp = unigram_lm._m_step(pieces, counts)

        wf.unpersist()
        t0 = time.perf_counter()
        model = unigram_lm.train_unigram(
            docs,
            vocab_size=VOCAB_SIZE,
            max_piece_len=MAX_PIECE_LEN,
            seed_size=SEED_SIZE,
        )
        t_train = time.perf_counter() - t0
        models[n] = model

        t0 = time.perf_counter()
        enc = unigram_lm.unigram_encode(docs, model)
        n_pieces = enc.agg(F.sum("n_pieces")).collect()[0][0]
        t_encode = time.perf_counter() - t0

        rows.append((n, n_types, t_seed, t_em1, t_train, len(model), t_encode, n_pieces))
        print(
            f"n={n:,}: types={n_types:,} seed={t_seed:.1f}s em1={t_em1:.1f}s "
            f"train={t_train:.1f}s vocab={len(model)} "
            f"encode={t_encode:.1f}s pieces={n_pieces:,}"
        )

    # types saturate at 50k for both corpus sizes, so the learned
    # vocabularies should agree almost everywhere (frequency ratios
    # differ only by sampling noise of the synthetic hash)
    p1 = {p for p, _ in models[100_000]}
    p2 = {p for p, _ in models[1_000_000]}
    overlap = len(p1 & p2) / max(len(p1 | p2), 1)
    print(f"vocab overlap 100k vs 1M: {overlap:.3f}")

    body = "\n".join(
        f"| {n:,} | {ty:,} | {ts:.1f} | {te1:.1f} | {tt:.1f} | {v} | {tc:.1f} | {np:,} |"
        for n, ty, ts, te1, tt, v, tc, np in rows
    )
    ratio = rows[1][4] / max(rows[0][4], 1e-9)
    update_section(
        "Unigram-LM trainer scaling (type-table EM)",
        "Same synthetic corpus as the BPE rows (24 tokens/doc, 50k word\n"
        "vocabulary — types saturate between the two sizes). Train = full\n"
        "EM+prune loop to a 1,000-piece vocabulary from a 4,000-piece\n"
        "seed (max piece length 6): every E-step / Viterbi-usage pass is\n"
        "ONE distributed job over the word-type table with the vocab\n"
        "broadcast, reduced by exact integer sums; the corpus is touched\n"
        "only by the word count and the final encode. em1 = one E-step\n"
        "at full seed width (the most expensive single job).\n\n"
        "| docs | word types | seed s | em1 s | train s | vocab | encode s | total pieces |\n"
        "|---|---|---|---|---|---|---|---|\n"
        f"{body}\n\n"
        f"Train time ratio 1M/100k = {ratio:.2f}× (type-bound: ~1.0× once\n"
        "types saturate; the corpus-size-dependent phases are the word\n"
        f"count inside train and the encode). Learned-vocab overlap\n"
        f"100k vs 1M = {overlap:.3f}.",
    )


def _wide_phase(spark) -> None:
    """Production vocab width at 1M docs: 8,000-piece target from a
    32,000-piece seed (the tokenizer sizes real pipelines train). The
    E-step cost is ~vocab-independent (per-word substring probes are
    dict lookups); what widens with the seed is the vocab-sized
    broadcast and the driver-side prune scoring — both bounded."""
    n = 1_000_000
    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    model = unigram_lm.train_unigram(
        docs, vocab_size=8_000, max_piece_len=8, seed_size=32_000
    )
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    enc = unigram_lm.unigram_encode(docs, model)
    n_pieces = enc.agg(F.sum("n_pieces")).collect()[0][0]
    t_encode = time.perf_counter() - t0
    print(
        f"wide: 1M docs vocab={len(model)} train={t_train:.1f}s "
        f"encode={t_encode:.1f}s pieces={n_pieces:,}"
    )
    update_section(
        "Unigram-LM trainer at production vocab width",
        "Same 1M-doc/50k-type corpus as the scaling rows, but trained to\n"
        "an 8,000-piece vocabulary from a 32,000-piece seed with max\n"
        "piece length 8 — the width real tokenizer pipelines train.\n\n"
        f"| docs | seed | target | final vocab | train s | encode s | total pieces |\n"
        f"|---|---|---|---|---|---|---|\n"
        f"| 1,000,000 | 32,000 | 8,000 | {len(model):,} | {t_train:.1f} "
        f"| {t_encode:.1f} | {n_pieces:,} |\n\n"
        "The E-step is ~vocab-independent (per-word substring probes are\n"
        "dict lookups bounded by max piece length), so widening the seed\n"
        "8× costs roughly the extra prune rounds plus the vocab-sized\n"
        "broadcast — not 8× the cluster work.",
    )


if __name__ == "__main__":
    main()
