#!/usr/bin/env python
"""Scale-stress probe for the text pipeline on a HEALTHY (wide-vocab)
corpus (appends to STRESS.md).

The fixture corpus has a 31-token vocabulary, so text-operator bench
numbers say little about vocabulary-bound behavior (ROUND_NOTES round 1).
This probe synthesizes 30-token docs over a 200k-token vocabulary (hash
expressions, no driver data) and times the vocabulary-bound operators at
increasing corpus sizes:

  - vocab_build   (explode → count → filter → rank: the D2 group-by)
  - encode_lookup (broadcast vocab join, position-ordered reassembly)
  - bm25          (tf/df aggs + broadcast stats, top-10)
  - chunk_text    (map-only sequence/posexplode/slice)

Usage: python tools/stress_text.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.operators import textanalysis, textops  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402

SIZES = [100_000, 1_000_000]
VOCAB = 200_000
TOKENS_PER_DOC = 30


def synth_docs(spark, n_docs: int, out: str):
    spark.range(n_docs).select(
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
    ).write.mode("overwrite").parquet(out)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("stress-text")
    lines = [
        f"{TOKENS_PER_DOC} tokens/doc over a {VOCAB:,}-token vocabulary",
        "(hash-synthesized). The vocabulary-bound operators stay shuffle-",
        "light: vocab build is one map-side-combinable agg, encode/BM25",
        "broadcast their vocabulary/stats sides, chunking never shuffles.",
        "The bigram LM column is the un-hinted-join validation: at 1M docs",
        "the bigram table has millions of rows — AQE picks the join side",
        "at runtime instead of a forced broadcast that would OOM at scale.",
        "",
        "| docs | vocab_build s | encode s | bm25 s | chunk s | bigram_lm s |",
        "|---|---|---|---|---|---|",
    ]
    for n in SIZES:
        path = f"/tmp/stress_text_{n}"
        synth_docs(spark, n, path)
        docs = spark.read.parquet(path)
        docs.count()  # warm the scan

        vocab = textops.build_vocab(docs).persist()
        t0 = time.perf_counter()
        _noop(vocab)
        t_vocab = time.perf_counter() - t0

        # encode timed against the MATERIALIZED vocab — otherwise the
        # encode window silently re-runs the whole vocab build
        t0 = time.perf_counter()
        _noop(textops.encode(docs, vocab))
        t_enc = time.perf_counter() - t0
        vocab.unpersist()

        t0 = time.perf_counter()
        _noop(textanalysis.bm25_search(docs, ["t0", "t1", "t2"], k=10))
        t_bm = time.perf_counter() - t0

        t0 = time.perf_counter()
        _noop(textops.chunk_text(docs))
        t_chunk = time.perf_counter() - t0

        t0 = time.perf_counter()
        _noop(textanalysis.bigram_logprob(docs))
        t_bg = time.perf_counter() - t0

        lines.append(
            f"| {n:,} | {t_vocab:.1f} | {t_enc:.1f} | {t_bm:.1f} | {t_chunk:.1f} | {t_bg:.1f} |"
        )
        print(lines[-1])

    from tools.stress_common import update_section

    update_section("Text pipeline on a wide-vocab corpus", "\n".join(lines))
    print("updated STRESS.md section: text pipeline")


if __name__ == "__main__":
    main()
