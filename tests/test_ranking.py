"""operators/ranking.py — exact global row_number / ntile without a
single-partition window (the zipWithIndex partition-offset shape)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_database_spark.operators.ranking import (
    global_ntile,
    global_row_number,
    ntile_from_rank,
)


def _base(spark, n=1000):
    # non-monotonic value column so range partitioning actually reorders
    return spark.range(0, n).withColumn("v", (F.col("id") * 37) % 101)


def test_global_row_number_matches_window(spark):
    df = _base(spark)
    got = global_row_number(df, [F.col("v").asc(), F.col("id").asc()], out_col="rn")
    want = df.select(
        "id",
        "v",
        F.row_number()
        .over(Window.orderBy(F.col("v").asc(), F.col("id").asc()))
        .cast("long")
        .alias("rn"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_row_number_no_single_partition_exchange(spark):
    df = _base(spark)
    got = global_row_number(df, [F.col("v").asc(), F.col("id").asc()])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_global_ntile_matches_window(spark):
    df = _base(spark, n=997)  # not divisible by 3: exercises ragged tiles
    for k in (3, 4, 10):
        got = global_ntile(df, [F.col("v").desc(), F.col("id").asc()], k=k, out_col="t")
        want = df.select(
            "id",
            "v",
            F.ntile(k)
            .over(Window.orderBy(F.col("v").desc(), F.col("id").asc()))
            .alias("t"),
        )
        assert got.exceptAll(want).count() == 0, k
        assert want.exceptAll(got).count() == 0, k


def test_global_ntile_fewer_rows_than_tiles(spark):
    small = spark.range(0, 2).withColumn("v", F.col("id"))
    rows = global_ntile(small, [F.col("v").asc()], k=5, out_col="t").orderBy("v").collect()
    # SQL ntile: each row gets its own tile when n < k
    assert [(r["v"], r["t"]) for r in rows] == [(0, 1), (1, 2)]


def test_ntile_from_rank_exact_partition_sizes(spark):
    # n = 10, k = 4 → tile sizes 3,3,2,2 (first n%k tiles take ceil(n/k))
    df = spark.range(1, 11).select(F.col("id").alias("rank"))
    tiles = [
        r["t"]
        for r in df.select(
            ntile_from_rank(F.col("rank"), F.lit(10), 4).alias("t")
        ).orderBy("rank").collect()
    ]
    assert tiles == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
