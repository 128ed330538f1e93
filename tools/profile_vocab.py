#!/usr/bin/env python
"""q_vocab_build timing evidence (round-5 directive #1).

Reproduces the bench context (fresh session, bench warmup, noop sink,
sf0.1) and records (a) 5 back-to-back full-query timings, (b) a stage
breakdown by materializing each prefix of the plan, (c) the same after a
fresh session to separate JIT/codegen warmth from plan cost.

Usage: python tools/profile_vocab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def noop_built(build) -> float:
    """Time a query INCLUDING its build step. q_vocab_build's ranking does
    an EAGER localCheckpoint + offsets collect at DataFrame-BUILD time
    (operators/ranking.py) — timing only the write missed the corpus pass
    entirely, which is exactly how round 4's '1.31s measured' claim
    happened (the bench, correctly, times build + execute)."""
    t0 = time.perf_counter()
    build().write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from vector_database_spark.operators import textops
    from vector_database_spark.queries import QUERIES
    from vector_database_spark.session import get_spark
    from vector_database_spark.sources.tables import read_table

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-vocab")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's round-4 warmup (one embeddings query only) — the context
    # in which the 3.6-5s driver numbers were recorded
    QUERIES["q_knn_topk"](spark, sf).write.mode("overwrite").format("noop").save()

    runs = [
        noop_built(lambda: QUERIES["q_vocab_build"](spark, sf)) for _ in range(5)
    ]
    print(f"back-to-back x5 (build+execute, r4-warmup context): {runs}")

    # stage breakdown, all build+execute, in the now-warm process
    t_scan = noop(read_table(spark, sf, "documents").select("text"))

    def counts_df():
        toks = textops.tokenized(read_table(spark, sf, "documents")).select(
            F.explode("tokens").alias("token")
        )
        return toks.groupBy("token").count().filter(
            F.col("count") >= textops.MIN_FREQUENCY
        )

    t_counts = noop_built(counts_df)
    n_vocab = counts_df().count()
    t_full = noop_built(lambda: QUERIES["q_vocab_build"](spark, sf))
    print(
        f"breakdown (warm): text scan {t_scan}s | corpus pass "
        f"(tokenize+explode+groupBy+filter) {t_counts}s | full query "
        f"{t_full}s | post-filter vocab rows {n_vocab} "
        f"(ranking stages = full - corpus = {round(t_full - t_counts, 3)}s)"
    )


if __name__ == "__main__":
    main()
