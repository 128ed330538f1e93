#!/usr/bin/env python
"""MinHash banding escalation on a DEGENERATE (small-vocab) corpus
(updates the STRESS.md "MinHash banding escalation on a degenerate
corpus" section — r9 directive 4).

The healthy-corpus probe (stress_dedup.py) shows fixed 2-rows-per-band
banding staying ~linear when vocabulary grows with the corpus. This
probe is the OTHER regime: a fixed 500-token vocabulary (boilerplate /
template-farm shape), where random token-set overlap alone makes the
fixed banding near-quadratic. minhash_neardup_pairs_auto probes the
candidate volume (sum of C(n,2) over band buckets — the exact row count
the band join would materialize) and escalates rows-per-band until the
volume fits the budget; planted near-duplicates (1 extra token on 20 =
Jaccard 0.952, banding collision ~0.999 even at the widest level) must
survive.

Usage: python tools/stress_minhash_auto.py
"""

from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.operators import dedup  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402

SIZES = [20_000, 100_000]
VOCAB = 500
TOKENS_PER_DOC = 20


def synth_docs(spark, n_docs: int, out: str):
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)),
                lambda j: F.concat(
                    F.lit("t"), F.pmod(F.xxhash64(F.col("id"), j), F.lit(VOCAB))
                ),
            ),
        ).alias("text"),
    )
    dups = base.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + n_docs).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    base.unionByName(dups).write.mode("overwrite").parquet(out)


def planted_found(verified, n: int) -> int:
    return verified.filter(
        (F.col("id_b") - F.col("id_a") == n) & (F.col("id_a") % 100 == 0)
    ).count()


def main() -> None:
    spark = get_spark("stress-minhash-auto")
    lines = [
        f"{TOKENS_PER_DOC} tokens/doc from a FIXED {VOCAB}-token vocabulary",
        "(the boilerplate regime stress_dedup.py's Heaps'-law caveat points",
        "at), 1% planted near-duplicates at Jaccard 0.952. 'fixed' is",
        "minhash_neardup_pairs (8 hashes x 4 bands, the oracle contract);",
        "'auto' is minhash_neardup_pairs_auto at the 2M default budget.",
        "Candidates = sum of C(n,2) over band buckets (what the band join",
        "materializes). Planted recall counts planted pairs in the",
        "VERIFIED output.",
        "",
        "| docs | plan | level | candidates | wall s | planted found |",
        "|---|---|---|---|---|---|",
    ]
    for n in SIZES:
        path = f"/tmp/stress_minhash_auto_{n}"
        synth_docs(spark, n, path)
        docs = spark.read.parquet(path)
        expected = (n + 99) // 100

        t0 = time.perf_counter()
        fixed = dedup.minhash_neardup_pairs(docs).persist()
        fixed.count()
        wall_fixed = time.perf_counter() - t0
        sigs = dedup.minhash_signatures(docs).persist()
        cands_fixed = dedup.minhash_candidate_volume(sigs)
        sigs.unpersist()
        pf_fixed = planted_found(fixed, n)
        fixed.unpersist()
        lines.append(
            f"| {n:,} | fixed | 0 | {cands_fixed:,} | {wall_fixed:.1f} | "
            f"{pf_fixed}/{expected} |"
        )
        print(lines[-1])

        stats: dict = {}
        t0 = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            auto = dedup.minhash_neardup_pairs_auto(docs, stats=stats).persist()
        auto.count()
        wall_auto = time.perf_counter() - t0
        pf_auto = planted_found(auto, n)
        auto.unpersist()
        lines.append(
            f"| {n:,} | auto | {stats['level']} | "
            f"{stats['volumes'][-1]:,} | {wall_auto:.1f} | "
            f"{pf_auto}/{expected} |"
        )
        print(lines[-1])

    lines += [
        "",
        "Reading: at 20k docs the level-0 volume fits the budget and the",
        "auto plan IS the fixed plan (bit-identical output — the",
        "q_dedup_minhash_auto oracle contract) at one cheap key-table",
        "probe of overhead (two-tier signatures: the widest hash pass is",
        "paid only on escalation). Past the budget the probe escalates",
        "rows-per-band BEFORE the verify join materializes anything —",
        "183x fewer candidates at 100k docs — while planted 0.95-Jaccard",
        "pairs keep ~0.999 banding collision probability. Honest wall",
        "note: on THIS fixture the escalated run is ~1.5x slower than",
        "fixed, because the 500-token vocabulary packs into 64-bit",
        "bitmask words and 15M candidate verifications cost ~2s — the",
        "volume bound pays off where candidates dominate: wide-vocab",
        "corpora verify via ~1KB/row token arrays (the representation",
        "flips past MAX_BITMASK_VOCAB), and at cluster scale the",
        "candidate stream is a real shuffle, not a local pipe. What the",
        "auto operator guarantees is that the materialized-candidate",
        "term is BOUNDED by the budget knob instead of data-dependent.",
        "The escalation trades mid-Jaccard recall (0.7-Jaccard: 96% -> 49%",
        "-> 14% down the ladder, dedup.MINHASH_ESCALATION_LEVELS doc) for",
        "that bound.",
    ]
    from tools.stress_common import update_section

    update_section(
        "MinHash banding escalation on a degenerate corpus (r10)",
        "\n".join(lines),
    )
    print("updated STRESS.md section: MinHash banding escalation")

    boilerplate_mix(spark)


def synth_boilerplate_mix(spark, n_docs: int, out: str, n_pool=25, n_bo=15,
                          n_content=10, content_vocab=5000):
    """Template-farm corpus: every doc carries ``n_bo`` of ``n_pool``
    shared boilerplate tokens (df = n_bo/n_pool = 60% each — above the
    DF prefilter cutoff) + ``n_content`` content tokens from a wide
    vocabulary. 1% planted near-dups at ~0.72 raw Jaccard: 3 boilerplate
    + 1 content token replaced — edits concentrated where real template
    near-dups differ, and exactly the mid-Jaccard range band-widening
    loses (banding collision at raw J=0.72: 96% at (8,4) -> 72% at
    (16,4) -> 27% at (32,4)). Generated driver-side (a 100k-row text
    fixture is ~17 MB — the corpus under test distributes; its
    generator need not)."""
    import random

    rng = random.Random(13)
    pool = [f"b{i}" for i in range(n_pool)]
    rows = []
    dup_rows = []
    for i in range(n_docs):
        bo = rng.sample(pool, n_bo)
        co = [f"c{rng.randrange(content_vocab)}" for _ in range(n_content)]
        rows.append((i, " ".join(bo + co)))
        if i % 100 == 0:
            new_bo = bo[:-3] + rng.sample([t for t in pool if t not in bo], 3)
            new_co = co[:-1] + [f"cx{i}"]
            dup_rows.append((i + n_docs, " ".join(new_bo + new_co)))
    spark.createDataFrame(
        rows + dup_rows, "doc_id long, text string"
    ).repartition(32).write.mode("overwrite").parquet(out)


def boilerplate_mix(spark) -> None:
    """r10 verdict directive 3 acceptance: on the boilerplate corpus the
    DF prefilter rung bounds candidates at UNCHANGED (8,4) banding and
    planted 0.7-0.8-J pairs stay >= 95% found, vs the pre-r11 ladder
    (band-widening only — simulated by disabling the rung) which loses
    them."""
    n = 100_000
    path = f"/tmp/stress_minhash_boiler_{n}"
    synth_boilerplate_mix(spark, n, path)
    docs = spark.read.parquet(path)
    expected = (n + 99) // 100
    budget = dedup.DEFAULT_MAX_CANDIDATES

    lines = [
        "100k-doc template farm: 15-of-25 shared boilerplate tokens per",
        "doc (df 60% each) + 10 content tokens from a 5000-token",
        "vocabulary; 1% planted near-dups at ~0.72 RAW Jaccard (3",
        "boilerplate + 1 content edits — the mid-Jaccard range widening",
        "loses). 'auto' = the r11 ladder (DF prefilter rung first);",
        "'widen-only' = the pre-r11 ladder, rung disabled.",
        "",
        "| plan | level | hashes x bands | df dropped | candidates | wall s | planted 0.72-J found |",
        "|---|---|---|---|---|---|---|",
    ]
    for label, fraction in (("auto", None), ("widen-only", 2.0)):
        old = dedup.MINHASH_DF_PREFILTER_FRACTION
        if fraction is not None:
            dedup.MINHASH_DF_PREFILTER_FRACTION = fraction
        try:
            stats: dict = {}
            t0 = time.perf_counter()
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", UserWarning)
                out = dedup.minhash_neardup_pairs_auto(
                    docs, max_candidates=budget, stats=stats
                ).persist()
            out.count()
            wall = time.perf_counter() - t0
            pf = planted_found(out, n)
            out.unpersist()
        finally:
            dedup.MINHASH_DF_PREFILTER_FRACTION = old
        lines.append(
            f"| {label} | {stats['level']} | {stats['num_hashes']}x"
            f"{stats['bands']} | {stats.get('df_dropped_tokens', 0)} | "
            f"{stats['volumes'][-1]:,} | {wall:.1f} | {pf}/{expected} |"
        )
        print(lines[-1])

    lines += [
        "",
        "Reading: the boilerplate tokens pin the same min-hashes onto",
        "most of the corpus, so level-0 volume explodes; the DF rung",
        "re-signs WITHOUT them (edits in dropped tokens stop counting",
        "against the pair, so the planted pairs' effective Jaccard",
        "RISES) and the volume collapses at unchanged (8,4) banding —",
        "mid-Jaccard recall preserved. The widen-only ladder pays the",
        "documented cliff on the same pairs. Trade stated in",
        "dedup.MINHASH_DF_PREFILTER_FRACTION's doc: boilerplate-ONLY",
        "similarity (identical template, disjoint content) stops being",
        "a candidate by design.",
    ]
    from tools.stress_common import update_section

    update_section(
        "MinHash DF prefilter rung on a boilerplate corpus (r11)",
        "\n".join(lines),
    )
    print("updated STRESS.md section: MinHash DF prefilter rung")


if __name__ == "__main__":
    main()
