"""Scale-safe global ordering primitives.

A global ``row_number()`` / ``ntile()`` over an unpartitioned window pulls
every row into ONE partition (Spark's WindowExec warns exactly that) — fine
on a fixture, fatal at 100 TB. The distributed shape for a total order is
the classic zipWithIndex scheme, expressed on DataFrames:

1. range-repartition on the order key (partitions are ordered ranges),
2. count rows per partition (tiny: one row per partition),
3. broadcast the cumulative offsets back,
4. partition-LOCAL ``row_number`` + offset = exact global rank.

Step 2 and step 4 are separate Spark jobs, so the partitioned input is
pinned with an eager ``localCheckpoint`` — range partitioning samples its
boundaries, and two independent recomputations are not guaranteed to cut
identical ranges. Pinning makes both jobs read the same materialized
partitions, so offsets always agree with local ranks.

Global rank makes exact ``ntile(k)`` a pure expression: with n rows,
n = k*q + r, the first r tiles take q+1 rows — so
tile(rank) = if rank <= r*(q+1) then ceil(rank/(q+1))
             else r + ceil((rank - r*(q+1))/q).
Identical to the SQL ``ntile`` the oracles use, with no global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__gr_pid"
_LRN = "__gr_local_rn"
_OFF = "__gr_offset"


def _global_row_number_with_total(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin boundaries across the two jobs
    )
    # tiny: one row per partition — the only driver-side data is P counts
    counts = sorted(
        (r[_PID], r["c"])
        for r in part.groupBy(_PID).agg(F.count("*").alias("c")).collect()
    )
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off_df = spark.createDataFrame(offsets or [(0, 0)], f"{_PID} int, {_OFF} long")
    local = Window.partitionBy(_PID).orderBy(*order_cols)
    ranked = (
        part.withColumn(_LRN, F.row_number().over(local).cast("long"))
        .join(F.broadcast(off_df), _PID)
        .withColumn(out_col, (F.col(_OFF) + F.col(_LRN)).cast("long"))
        .drop(_PID, _LRN, _OFF)
    )
    return ranked, acc


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based row_number over ``order_cols`` without a
    single-partition window. The order must be total (include a unique
    tie-break column) for the result to be deterministic.

    Adds ``out_col`` (long) to ``df``; all original columns pass through.
    """
    ranked, _ = _global_row_number_with_total(df, order_cols, out_col, num_partitions)
    return ranked


def ntile_from_rank(rank: Column, n_rows: Column, k: int) -> Column:
    """Exact SQL ``ntile(k)`` from a global rank and the total row count:
    the first ``n_rows % k`` tiles get ``ceil(n/k)`` rows, the rest get
    ``floor(n/k)`` — identical to the window function, as a map-side
    expression."""
    q = F.floor(n_rows / k)
    r = n_rows % k
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(r + F.ceil((rank - big) / F.greatest(q, F.lit(1))))
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``ntile(k)`` over ``order_cols`` via
    :func:`global_row_number` — same output as the unpartitioned window,
    scale-safe plan. The total row count is the final cumulative offset,
    already on the driver, so it folds into the plan as a literal."""
    ranked, total = _global_row_number_with_total(
        df, order_cols, "__gr_rank", num_partitions
    )
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("__gr_rank"), F.lit(total), k)
    ).drop("__gr_rank")
