#!/usr/bin/env python
"""Scale-stress probe: retrieval-eval harness, window plan vs two-phase
(appends to STRESS.md). The window version shuffles |corpus|·|Q| scored
rows and funnels each query through one reducer; the two-phase version
ships 2·k·P·|Q| heap candidates. Both must emit identical metric rows.

Usage: python tools/stress_eval.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from vector_database_spark.operators import knn  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402
from tools.stress_common import update_section  # noqa: E402

K = 10


def synth(spark, n):
    comp = lambda j: (  # noqa: E731
        (F.pmod(F.hash(F.col("id"), F.lit(j)), F.lit(19)).cast("double") / 10.0)
        - 0.9
    )
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j) for j in range(64)]).cast("array<float>").alias("embedding"),
    )


def _rollup_from_legs(legs):
    from vector_database_spark.queries import _retrieval_rollup

    w = Window.partitionBy("qid", "leg").orderBy(F.col("key").desc(), F.col("vec_id").asc())
    top = legs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= K)
    truth = top.filter(F.col("leg") == "truth").select(
        "qid", "vec_id", F.col("rnk").alias("truth_rank")
    )
    sysl = top.filter(F.col("leg") == "sys").select(
        "qid", "vec_id", F.col("rnk").alias("sys_rank")
    )
    return _retrieval_rollup(truth.join(sysl, ["qid", "vec_id"]))


def _window_rollup(spark, emb, queries, corpus_pred):
    # the q_retrieval_metrics shape on synthetic data: score every row per
    # query, rank with two qid-partitioned windows
    from vector_database_spark.functions.vector import cosine, micro6
    from vector_database_spark.queries import _retrieval_rollup

    qdf = spark.createDataFrame(
        [(i, v) for i, v in queries], "qid long, qv array<float>"
    )
    embd = F.col("embedding").cast("array<double>")
    mx = F.array_max(F.transform(embd, lambda x: F.abs(x)))
    scale = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))
    q8 = F.transform(
        embd,
        lambda x: (
            F.floor(F.abs(x) * scale + F.lit(0.5)) * F.when(x < 0, -1).otherwise(1)
        ).cast("double"),
    )
    quant = emb.select("vec_id", "embedding", q8.alias("q8"))
    qq = quant.join(qdf.hint("broadcast"), F.col("vec_id") == F.col("qid")).select(
        "qid", F.col("embedding").alias("qv"), F.col("q8").alias("qq8")
    )
    from vector_database_spark.functions.vector import dot

    scored = quant.filter(corpus_pred).crossJoin(F.broadcast(qq)).select(
        "qid",
        "vec_id",
        micro6(cosine(F.col("embedding"), F.col("qv"))).alias("cm"),
        dot(F.col("q8"), F.col("qq8")).cast("long").alias("qd"),
    )
    wt = Window.partitionBy("qid").orderBy(F.col("cm").desc(), F.col("vec_id").asc())
    ws = Window.partitionBy("qid").orderBy(F.col("qd").desc(), F.col("vec_id").asc())
    ranked = scored.select(
        "qid",
        F.row_number().over(wt).alias("truth_rank"),
        F.row_number().over(ws).alias("sys_rank"),
    ).filter((F.col("truth_rank") <= K) & (F.col("sys_rank") <= K))
    return _retrieval_rollup(ranked)


def main() -> None:
    spark = get_spark("stress_eval")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in (100_000, 500_000):
        emb = synth(spark, n).localCheckpoint(eager=True)
        queries = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") % (n // 16) == 0).collect()
        ]
        corpus = emb.filter(~F.col("vec_id").isin([q[0] for q in queries]))

        t0 = time.perf_counter()
        two = sorted(tuple(r) for r in _rollup_from_legs(
            knn.retrieval_eval_candidates(queries, corpus, k=K)
        ).collect())
        t_two = time.perf_counter() - t0

        t0 = time.perf_counter()
        win = sorted(
            tuple(r)
            for r in _window_rollup(
                spark, emb, queries, ~F.col("vec_id").isin([q[0] for q in queries])
            ).collect()
        )
        t_win = time.perf_counter() - t0

        same = two == win
        rows.append((n, t_win, t_two, same))
        print(f"n={n:,}: window={t_win:.1f}s twophase={t_two:.1f}s identical={same}")
        assert same, "metric rows must be identical"

    body = "\n".join(
        f"| {n:,} | {tw:.1f} | {tt:.1f} | {'✓' if s else 'X'} |"
        for n, tw, tt, s in rows
    )
    update_section(
        "Retrieval-eval harness: window plan vs two-phase heaps",
        "16 corpus-member queries, recall/MRR/nDCG@10 of the int8 leg vs\n"
        "exact cosine, hash-deterministic 64-d vectors. The window plan\n"
        "shuffles |corpus|x16 scored rows and funnels each query through\n"
        "one reducer; the two-phase plan ships 2x10xPx16 heap candidates.\n"
        "Identical metric rows asserted per run.\n\n"
        "| corpus rows | window s | two-phase s | identical |\n"
        "|---|---|---|---|\n" + body,
    )
    print("STRESS.md updated")


if __name__ == "__main__":
    main()
