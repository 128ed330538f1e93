"""Phase profile of q_dedup_minhash_auto / q_incremental_dedup_auto at a
given SF (guide §1: measure first; label jobs). Times each eager driver
round-trip inside the operators by monkey-wrapping the collect/count sites
is fragile — instead this re-runs the query end-to-end N times and, in a
second pass, times the operator's internal phases by reproducing them
step-by-step with setJobDescription labels, so the Spark UI / logs and the
wall numbers line up.

Usage: python tools/profile_dedup_auto.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.session import get_spark  # noqa: E402
from vector_database_spark.operators import dedup  # noqa: E402
from vector_database_spark import queries as Q  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {dt:7.3f}s  {label}")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("profile_dedup_auto")
    sc = spark.sparkContext

    # warm the scan/codegen paths once
    docs = Q._docs_with_near_dups(spark, sf_dir)
    docs.write.mode("overwrite").format("noop").save()

    print("== q_dedup_minhash_auto end-to-end ==")
    for i in range(runs):
        t0 = time.perf_counter()
        Q.q_dedup_minhash_auto(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        print(f"  run {i}: {time.perf_counter() - t0:.3f}s")

    print("== phase breakdown (step-by-step reproduction) ==")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        docs = Q._docs_with_near_dups(spark, sf_dir)
        sc.setJobDescription("phase: toks+sigs8+volume probe L0")
        toks = dedup._doc_tokens(docs, "text", "doc_id").persist()
        from vector_database_spark.functions.hashing import seeded_hash

        aggs8 = [
            F.min(seeded_hash(F.col("token"), i)).alias(f"h{i}") for i in range(8)
        ]
        sigs = toks.groupBy("doc_id").agg(*aggs8).persist()
        v0 = t(
            "L0 volume probe (computes toks+sigs8)",
            lambda: dedup.minhash_candidate_volume(sigs, "doc_id", 8, 4),
        )
        n_docs = t("sigs.count", lambda: sigs.count())
        high_df = (
            toks.groupBy("token")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > int(0.5 * n_docs))
            .select("token")
            .persist()
        )
        sc.setJobDescription("phase: DF analysis")
        dfd = t("high_df.count", lambda: high_df.count())
        print(f"    v0={v0} n_docs={n_docs} df_dropped={dfd}")
        sc.setJobDescription("phase: fallback+filt_toks+wide sigs+ladder probe")
        content_n = (
            toks.join(F.broadcast(high_df), "token", "left_anti")
            .groupBy("doc_id")
            .agg(F.count("*").alias("__n"))
        )
        fallback_ids = sigs.select("doc_id").join(
            content_n.filter(F.col("__n") >= 4), "doc_id", "left_anti"
        )
        filt = (
            toks.join(F.broadcast(high_df.withColumn("__hi", F.lit(True))), "token", "left")
            .join(fallback_ids.withColumn("__fb", F.lit(True)), "doc_id", "left")
            .filter(F.col("__fb").isNotNull() | F.col("__hi").isNull())
            .select("doc_id", "token")
            .persist()
        )
        wide = dedup._wide_minhash_signatures(filt, "doc_id", 32).persist()
        vols = t(
            "ladder probe (computes filt+wide)",
            lambda: dedup._ladder_volumes(wide, "doc_id", [(8, 4), (16, 4), (32, 4)]),
        )
        print(f"    ladder vols={vols}")
        sc.setJobDescription("phase: verify n_docs count")
        t("docs.count (verify n_docs)", lambda: docs.select("doc_id").count())
        sc.setJobDescription("phase: verify vocab count+collect")
        from vector_database_spark.functions.text import explode_tokens

        vtoks = explode_tokens(docs, ("doc_id",), "text", distinct=True)
        vocab = vtoks.select("token").distinct()
        t("vocab.count", lambda: vocab.count())
        t("vocab.collect", lambda: vocab.collect())
        sc.setJobDescription("phase: band join + verify + noop")
        cands = dedup.minhash_band_pairs(wide, "doc_id", 32, 4)
        out = t(
            "jaccard_verify build (eager n_docs+vocab jobs)",
            lambda: dedup.jaccard_verify(cands, docs, "text", "doc_id"),
        )
        t(
            "band join + bitmask verify + write",
            lambda: out.write.mode("overwrite").format("noop").save(),
        )
        for df in (toks, high_df, filt, wide, sigs):
            df.unpersist()
        sc.setJobDescription(None)

    print("== q_incremental_dedup_auto end-to-end (memoized index) ==")
    for i in range(runs + 1):
        t0 = time.perf_counter()
        Q.q_incremental_dedup_auto(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        print(f"  run {i}: {time.perf_counter() - t0:.3f}s" + (" (cold: index build)" if i == 0 else ""))

    print("== q_incremental_dedup_auto phase breakdown (warm index) ==")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        corpus, incoming = Q._incremental_dedup_sides(spark, sf_dir)
        idx, counts, corp_toks, n_corpus, corp_vocab = Q._corpus_index_cached(
            spark, sf_dir, corpus
        )
        n_inc = t(
            "disjoint check + incoming count (one job, r12)",
            lambda: dedup._check_disjoint_ids(
                incoming, idx, "doc_id", count_incoming=True
            ),
        )
        inc_sigs = dedup.minhash_index_signatures(incoming, "text", "doc_id").persist()
        first = (8, 4)
        levels = [first, (16, 4), (32, 4)]
        vols = t(
            "cross-volume probe (computes inc_sigs)",
            lambda: dedup._cross_volumes(idx, inc_sigs, "doc_id", levels, counts),
        )
        print(f"    cross vols={vols}")
        chosen = (32, 4)
        inc_bands = dedup.band_keys(inc_sigs, "doc_id", *chosen).withColumnRenamed(
            "bid", "id_b"
        )
        cands = (
            dedup.band_keys(idx, "doc_id", *chosen)
            .withColumnRenamed("bid", "id_a")
            .join(dedup._maybe_broadcast(inc_bands, n_inc, 40), "band_key")
            .select("id_a", "id_b")
            .distinct()
        )
        out = t(
            "verdict build (verify eager n_docs+vocab jobs)",
            lambda: dedup._incremental_verdict(
                cands, incoming, corpus, "text", "doc_id",
                dedup.JACCARD_THRESHOLD, corpus_tokens=corp_toks,
                n_corpus=n_corpus, n_incoming=n_inc,
                corpus_vocab=corp_vocab,
            ),
        )
        t(
            "verdict write (band join + verify + fold)",
            lambda: out.write.mode("overwrite").format("noop").save(),
        )
        inc_sigs.unpersist()


if __name__ == "__main__":
    main()
