#!/usr/bin/env python
"""Scale-stress probe for SimHash Hamming banding (appends to STRESS.md).

Round-4's defaults (16-bit fingerprints split into 4-bit bands) gave each
band only 16 distinct values, so the band join generated ~N²/16 candidate
pairs regardless of similarity — quadratic on any corpus. Round 5 moved to
Manku et al. 2007's operating point: 64-bit fingerprints, 4 bands of 16
bits (2^16 values per band). This probe measures CANDIDATE PAIR COUNTS of
both configurations on the same wide-vocab corpus (30 tokens/doc from a
20k vocabulary, 1% planted exact copies) so the fix is recorded as a
number, not an assertion. Candidates are counted from band-key group
sizes (Σ over bands and groups of C(n,2)) — no pair join materialized, so
the quadratic legacy config stays countable at probe sizes.

Planted exact copies have Hamming 0 — every band collides, so banding
losslessness is checked alongside (found == planted at every size).

Usage: python tools/stress_simhash.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.operators import dedup  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402

SIZES = [50_000, 200_000, 800_000]
VOCAB = 20_000
TOKENS_PER_DOC = 30
BANDS = 4


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
    # 1% planted EXACT copies: Hamming 0 → must collide in every band
    dups = base.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + n_docs).alias("doc_id"), "text"
    )
    base.unionByName(dups).write.mode("overwrite").parquet(out)


def candidate_count(sigs, bits: int, bands: int) -> int:
    """Σ over bands of Σ over band-value groups of C(n,2) — the number of
    candidate pairs the band join would materialize (pre-dedup across
    bands, which is what actually shuffles)."""
    bits_per = bits // bands
    mask = (1 << bits_per) - 1
    total = 0
    for b in range(bands):
        key = F.shiftright(F.col("simhash"), b * bits_per).bitwiseAND(F.lit(mask))
        grp = sigs.groupBy(key.alias("bk")).agg(F.count("*").alias("n"))
        row = grp.agg(
            F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("p")
        ).collect()[0]
        total += row["p"]
    return total


def found_planted(sigs, n_docs: int) -> int:
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh"))
    b = sigs.select((F.col("doc_id") - n_docs).alias("id_a"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, "id_a")
        .filter(F.bit_count(F.col("sh").bitwiseXOR(F.col("sh_b"))) <= 3)
        .count()
    )


def main() -> None:
    spark = get_spark("stress-simhash")
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        f"{TOKENS_PER_DOC} tokens/doc from a {VOCAB:,}-token vocabulary, 1%",
        "planted exact copies. `cand(16b)` is the candidate-pair count of the",
        "round-4 defaults (16-bit fingerprints, 4-bit bands → 16 values per",
        "band: ~N²/16 no matter the data); `cand(64b)` is the round-5",
        "operating point (64-bit, 16-bit bands — Manku et al. 2007). Planted",
        "copies have Hamming 0, so `found` == planted checks banding",
        "losslessness at the new width. Candidates counted from band-group",
        "sizes (no pair join), so the legacy column stays computable.",
        "",
        "Reading the numbers honestly: the fix buys a constant-factor 2^12",
        "(3,100-4,100x measured) — this synth corpus hashes to near-uniform",
        "fingerprints, so each 16-bit band keeps an irreducible random-collision",
        "floor of ~4N²/2^17 pairs (measured 27.8M at 808k docs ≈ the predicted",
        "4·808k²/2/65536 = 39.8M times the dup factor), visible as cand/doc",
        "growing ~N/16384. On a REAL near-dup corpus the signal pairs dominate",
        "that floor until N approaches ~10M; past that, the standard escalation",
        "(Manku §3: more blocks, compound band keys — e.g. 6 blocks keyed on",
        "every C(6,3)=20 choice of 3, ~32-bit keys → floor N²·20/2^33) drops the",
        "floor another ~2^15 at 5x the band-join width. The `bands`/key-width",
        "trade is a parameter of the same operator; 4x16 is the shipped default",
        "because it is lossless for k<=3 with the fewest tables.",
        "",
        "| docs | cand(16b legacy) | cand(64b) | 64b/doc | planted found | sig wall s |",
        "|---|---|---|---|---|---|",
    ]
    for n in SIZES:
        path = f"/tmp/stress_simhash_{n}"
        synth_docs(spark, n, path)
        docs = spark.read.parquet(path)
        t0 = time.perf_counter()
        sigs64 = dedup.simhash(docs, bits=64).persist()
        n64 = sigs64.count()
        wall = time.perf_counter() - t0
        sigs16 = dedup.simhash(docs, bits=16).persist()
        c16 = candidate_count(sigs16, 16, BANDS)
        c64 = candidate_count(sigs64, 64, BANDS)
        planted = (n + 99) // 100
        found = found_planted(sigs64, n)
        lines.append(
            f"| {n64:,} | {c16:,} | {c64:,} | {c64 / n64:.2f} | "
            f"{found}/{planted} | {wall:.1f} |"
        )
        print(lines[-1], flush=True)
        sigs64.unpersist()
        sigs16.unpersist()

    from tools.stress_common import update_section

    update_section("SimHash banding: 64-bit vs legacy 16-bit", "\n".join(lines))
    print("updated STRESS.md section: SimHash banding")


if __name__ == "__main__":
    main()
