#!/usr/bin/env python
"""Scale-stress probe for the batch k-NN operators (writes STRESS.md).

The fixtures top out at 2,000 vectors, which says nothing about operator
scaling. This generates a deterministic N-row 64-d collection (fixture
vectors × per-replica perturbation derived from the portable hash — pure
expressions, no driver-side data), then times, at each N:

  - knn_batch            (broadcast queries + full window rank: the
                          shuffle carries every scored row)
  - knn_batch_local_topk (two-phase: per-partition heaps via BLAS matmul,
                          shuffle carries only k·P candidates)

and checks they return identical ids. Usage: python tools/stress_knn.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.operators import knn  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402

SIZES = [20_000, 100_000, 200_000, 1_000_000]
WINDOW_MAX = 200_000  # the window plan is O(rows·queries) through a shuffle;
                      # beyond this only the two-phase plan is timed
K = 5
N_QUERIES = 20


def synth_embeddings(spark, n_rows: int, base_dir: str, out: str):
    """Blow the 2k-row fixture up to n_rows deterministically: replica r of
    vector v gets embedding[j] + (hash(r,v,j)-derived) noise — expression
    only, fully parallel, no collect."""
    base = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    n_base = base.count()
    reps = (n_rows + n_base - 1) // n_base
    replicated = base.crossJoin(
        spark.range(reps).withColumnRenamed("id", "rep")
    ).withColumn("vec_id", F.col("vec_id") + F.col("rep") * n_base)
    perturbed = replicated.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x, i: x
            + (
                F.pmod(
                    F.xxhash64(F.col("rep"), F.col("vec_id"), i), F.lit(1000)
                ).cast("double")
                / 1000.0
                - 0.5
            )
            * 0.02,
        ).cast("array<float>").alias("embedding"),
    ).filter(F.col("vec_id") < n_rows)
    perturbed.write.mode("overwrite").parquet(out)


def main() -> None:
    spark = get_spark("stress")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lines = [
        f"{N_QUERIES} query vectors × top-{K}, 64-d synthetic collection grown",
        "from the sf0.1 fixture (deterministic hash perturbation). local[32].",
        "",
        "| rows | knn_batch (window) s | knn_batch_local_topk (two-phase) s | ids equal | knn_batch_auto s | branch picked |",
        "|---|---|---|---|---|---|",
    ]
    for n in SIZES:
        path = f"/tmp/stress_emb_{n}"
        synth_embeddings(spark, n, sf_dir, path)
        emb = spark.read.parquet(path)
        qrows = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect()
        queries_df = spark.createDataFrame(
            [(r["vec_id"], list(r["embedding"])) for r in qrows], "qid long, qv array<float>"
        )
        queries_list = [(r["vec_id"], list(r["embedding"])) for r in qrows]

        if n <= WINDOW_MAX:
            t0 = time.perf_counter()
            a = knn.knn_batch(queries_df, emb, k=K, payload_cols=())
            a_rows = {(r["qid"], r["vec_id"]) for r in a.collect()}
            t_window = time.perf_counter() - t0
        else:
            a_rows, t_window = None, None

        t0 = time.perf_counter()
        b = knn.knn_batch_local_topk(queries_list, emb, k=K)
        b_rows = {(r["qid"], r["vec_id"]) for r in b.collect()}
        t_two = time.perf_counter() - t0

        same = "True" if a_rows == b_rows else ("—" if a_rows is None else "False")
        t_window_s = f"{t_window:.2f}" if t_window is not None else "— (not run)"

        # the adaptive dispatcher (rows_hint supplied, as a production
        # caller with table metadata would): record which physical branch
        # the 2M-pair budget picks at each size and that its rows agree
        t0 = time.perf_counter()
        c = knn.knn_batch_auto(queries_list, emb, k=K, rows_hint=n)
        c_rows = {(r["qid"], r["vec_id"]) for r in c.collect()}
        t_auto = time.perf_counter() - t0
        branch = (
            "two-phase"
            if "MapInPandas" in c._jdf.queryExecution().executedPlan().toString()
            else "window"
        )
        assert c_rows == b_rows, f"auto branch diverged at {n}"

        lines.append(
            f"| {n:,} | {t_window_s} | {t_two:.2f} | {same} | {t_auto:.2f} | {branch} |"
        )
        print(lines[-1])

    lines += [
        "",
        "The window plan shuffles every scored row (rows × queries tuples);",
        "the two-phase plan shuffles only k·P candidates per query and does",
        "its scoring in one BLAS matmul per Arrow batch. The gap widens",
        "linearly with collection size — at cluster scale the window plan's",
        "shuffle is the bottleneck, the two-phase plan's shuffle is constant.",
        "knn_batch_auto dispatches between them on estimated pair volume",
        "(rows × queries vs a 2M budget) — the branch column shows the",
        "flip happening between 100k (2M pairs, window) and 200k (4M,",
        "two-phase), and the equality assert proves the choice is purely",
        "physical.",
    ]
    from tools.stress_common import update_section

    update_section("Batch k-NN scaling", "\n".join(lines))
    print("updated STRESS.md section: Batch k-NN scaling")


if __name__ == "__main__":
    main()
