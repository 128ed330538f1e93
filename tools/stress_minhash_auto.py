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


if __name__ == "__main__":
    main()
