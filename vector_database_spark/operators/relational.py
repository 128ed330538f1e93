"""Relational operators over the TPC-H-ish fixtures (SURVEY §2.E/§2.F):
enrichment joins, global top-k, time-window aggregation, JSON extraction.

These carry the sf0.1 bench: they exercise broadcast-vs-shuffle join
selection, map-side-combined aggregation, TakeOrderedAndProject, and
predicate pushdown — the physical plans a 100 TB deployment lives on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_spark.functions.vector import micro6, round6


def _dec_sum(col: str) -> F.Column:
    """Order-independent double sum: exact DECIMAL(38,6) addition, then a
    single cast back to DOUBLE — bit-identical across engines regardless of
    partial-aggregation order."""
    return F.sum(F.col(col).cast("decimal(38,6)")).cast("double")


def join_enrich(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """F4: orders ⋈ customer ⋈ nation ⋈ region → revenue per region/nation.

    nation/region are tiny dims → broadcast (no shuffle of the fact side
    for those hops); customer is broadcast here too (150 rows per sf unit)
    but would be a shuffle join at real scale — Catalyst/AQE decides from
    stats, we only *hint* the always-tiny dims.
    Output: (r_name, n_name, n_orders, revenue, avg_price).
    """
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            round6(_dec_sum("o_totalprice")).alias("revenue"),
        )
        .withColumn(
            "avg_price_micro", micro6(F.col("revenue") / F.col("n_orders").cast("double"))
        )
        .orderBy("r_name", "n_name")
    )


def topk_global(lineitem: DataFrame, k: int = 10) -> DataFrame:
    """F7: global top-k lineitems by extendedprice (order stability via
    full tie-break on the composite key). Compiles to TakeOrderedAndProject.
    Output: (l_orderkey, l_linenumber, l_extendedprice).
    """
    return (
        lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(k)
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-style pricing summary — the canonical agg bench query.

    Map-side partial aggregation on 2 low-cardinality keys; DECIMAL sums
    for cross-engine determinism.
    """
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_dp")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).alias("_ch")
    base = lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02")).select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", disc_price, charge,
    )
    return (
        base.groupBy("l_returnflag", "l_linestatus")
        .agg(
            round6(_dec_sum("l_quantity")).alias("sum_qty"),
            round6(_dec_sum("l_extendedprice")).alias("sum_base_price"),
            round6(_dec_sum("_dp")).alias("sum_disc_price"),
            round6(_dec_sum("_ch")).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn(
            "avg_qty_micro", micro6(F.col("sum_qty") / F.col("count_order").cast("double"))
        )
        .withColumn(
            "avg_price_micro",
            micro6(F.col("sum_base_price") / F.col("count_order").cast("double")),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def event_window(events: DataFrame) -> DataFrame:
    """F5: hourly tumbling-window aggregation per event_type — the batch
    twin of the streaming query (streaming/events.py). Hour emitted as a
    string so Spark/DuckDB timestamp representations compare equal.
    Output: (hour, event_type, n, sum_value, avg_value).
    """
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        events.select(hour.alias("hour"), "event_type", "value")
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n"),
            round6(_dec_sum("value")).alias("sum_value"),
        )
        .withColumn("avg_value_micro", micro6(F.col("sum_value") / F.col("n").cast("double")))
        .orderBy("hour", "event_type")
    )


def json_extract(events: DataFrame) -> DataFrame:
    """F6: JSON payload extraction from the events ``props`` column
    (the reference's schemaless payload analogue, vector_db.py:89).
    Output: (event_id, k_str, k_int, k_bucket).
    """
    k = F.get_json_object(F.col("props"), "$.k")
    return events.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_int"),
        (k.cast("long") % 10).alias("k_bucket"),
    )


def salted_agg(lineitem: DataFrame, salts: int = 8) -> DataFrame:
    """Skew-resistant two-stage aggregation (SURVEY §4.3 skew row).

    Stage 1 groups by (key, salt) — a hot key's rows spread over ``salts``
    reducers — stage 2 folds the partials by key. Semantically identical to
    a plain groupBy (the oracle IS the plain group-by); at scale this is
    the manual fallback when AQE skew handling can't split a single
    monster group. The salt is deterministic (orderkey % salts) so results
    are reproducible.
    Output: (l_returnflag, n, sum_qty).
    """
    stage1 = (
        lineitem.withColumn("__salt", (F.col("l_orderkey") % salts).cast("int"))
        .groupBy("l_returnflag", "__salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("pq"),
        )
    )
    return (
        stage1.groupBy("l_returnflag")
        .agg(
            F.sum("pn").alias("n"),
            round6(F.sum("pq").cast("double")).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


def funnel_steps(events: DataFrame) -> DataFrame:
    """Ordered view → click → purchase funnel: per-stage user counts,
    each later step strictly AFTER the user's first completion of the
    previous one. Output: (stage, n_users) — 3 rows.

    Chained filtered min-aggregations joined on user_id; every stage is
    map-side partial-agg combinable and the frontier only shrinks.
    Shared by queries.py::q_funnel_steps and the 10M-event probe
    (tools/stress_events.py)."""
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(v, "1_view")
        .unionAll(stage(c, "2_click"))
        .unionAll(stage(p, "3_purchase"))
    )


def scd2_intervals(events: DataFrame) -> DataFrame:
    """SCD Type-2 interval construction over each user's event_type
    'state': one row per state CHANGE with [valid_from, valid_to) bounds
    in exact epoch microseconds and a current flag. Output: (user_id,
    event_type, valid_from_us, valid_to_us, is_current).

    Two window passes (lag change-detect, lead close) over the SAME
    (user_id, ts, event_id) sort — Catalyst reuses one shuffle+sort.
    Shared by queries.py::q_scd2_intervals and the 10M-event probe."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    changes = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    out = changes.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
    )
    return out.select(
        "user_id",
        "event_type",
        "valid_from_us",
        "valid_to_us",
        F.col("valid_to_us").isNull().alias("is_current"),
    )


def asof_last_click(events: DataFrame) -> DataFrame:
    """As-of join expressed as a running window: for every purchase event,
    the epoch-second of the same user's most recent click at-or-before it.

    The classic pattern for Spark's missing native as-of join: one window
    over the unified stream with last(..., ignorenulls) — a single shuffle
    on user_id, no per-row probes.
    Output: (event_id, user_id, last_click_sec NULLABLE).
    """
    from pyspark.sql.window import Window

    sec = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = events.withColumn(
        "click_sec", F.when(F.col("event_type") == "click", sec)
    ).withColumn("last_click_sec", F.last("click_sec", ignorenulls=True).over(w))
    return tagged.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "last_click_sec"
    )


def downsample_events(events: DataFrame, bucket_seconds: int = 900) -> DataFrame:
    """Hypertable-style downsampling: fixed-width time buckets per series
    (event_type), the batch form of a continuous aggregate / rollup.
    Output: (bucket_sec, event_type, n, sum_value).
    """
    bucket = (
        (F.col("ts").cast("long") / bucket_seconds).cast("long") * bucket_seconds
    ).alias("bucket_sec")
    return (
        events.select(bucket, "event_type", "value")
        .groupBy("bucket_sec", "event_type")
        .agg(
            F.count("*").alias("n"),
            round6(_dec_sum("value")).alias("sum_value"),
        )
        .orderBy("bucket_sec", "event_type")
    )


def window_funcs(lineitem: DataFrame) -> DataFrame:
    """Ranking/offset/frame window functions per supplier (SURVEY §2.E
    window row): row_number, rank over price, lag, and a running DECIMAL
    sum — all on one (suppkey, shipdate) partitioning → a single shuffle.
    Output: (l_suppkey, l_orderkey, l_linenumber, rn, price_rank, prev_qty,
    running_qty).
    """
    from pyspark.sql.window import Window

    # the fixture violates TPC-H's (l_orderkey, l_linenumber) key at
    # sf0.1 (143k duplicate pairs), so the orderings include EVERY column
    # the query reads: remaining ties are then only between fully
    # identical rows, which makes the output deterministic as a multiset
    # (the driver's order-insensitive compare) in any engine
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    wp = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_shipdate").asc(),
        F.col("l_quantity").asc(),
    )
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("l_suppkey")
    rank_col = F.rank().over(wp).cast("long")
    n_col = F.count(F.lit(1)).over(wn).cast("long")
    from vector_database_spark.operators.ranking import ntile_from_rank

    return lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).cast("long").alias("rn"),
        rank_col.alias("price_rank"),
        F.lag(F.col("l_quantity"), 1).over(w).alias("prev_qty"),
        round6(F.sum(F.col("l_quantity").cast("decimal(38,6)")).over(run).cast("double")).alias(
            "running_qty"
        ),
        # quartile derived from the TIE-AWARE rank (declared semantics,
        # identical formula in the oracle): position-based ntile() would
        # split fully identical rows across a boundary arbitrarily, and
        # the arbitrary pairing with the other window's position-based
        # columns (rn, prev_qty, running_qty) is engine-dependent — the
        # one residual nondeterminism total orderings cannot remove
        ntile_from_rank(rank_col, n_col, 4).cast("long").alias("price_quartile"),
        # percent_rank/cume_dist are integer ratios → micro6, never a raw
        # 6dp round (half-boundary flake, FIXTURES rule 6)
        micro6(F.percent_rank().over(wp)).alias("price_pct_rank_micro"),
        micro6(F.cume_dist().over(wp)).alias("price_cume_dist_micro"),
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions via the built-in ``session_window`` (the native
    twin of :func:`sessionize`; also valid in Structured Streaming).
    Output: (user_id, session_start_sec, n_events).
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start_sec"),
            "n_events",
        )
        .orderBy("user_id", "session_start_sec")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user session ids from inactivity gaps — the
    classic lag + cumulative-sum window pattern (no UDF, two windows over
    the same (user_id, ts) partitioning → one shuffle).
    Output: (event_id, user_id, ts, session_id).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long"), 1).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (
        events.withColumn("__new", new_sess)
        .withColumn("session_seq", F.sum("__new").over(w).cast("long"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.concat_ws("_", F.col("user_id"), F.col("session_seq")).alias("session_id"),
        )
    )


def zorder_key(a, b, bits: int = 10):
    """Morton (Z-order) interleave of two ``bits``-wide non-negative
    integer columns: bit j of ``a`` lands at position 2j, bit j of ``b``
    at 2j+1. Rows sorted/range-partitioned by this key cluster in BOTH
    dimensions at once, so per-file min/max stats stay narrow on both
    source columns and a 2-d box predicate prunes files — the multi-column
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER BY) that a plain
    sort gives only its leading column. Pure bit arithmetic → identical
    in any engine; the expression is 2×bits codegen'd shifts. Inputs are
    masked to ``bits`` (pmod by 2^bits) so out-of-range values wrap
    instead of silently aliasing onto unrelated keys by bit truncation —
    callers should still pre-bucket (e.g. ``pmod(col, 1024)``) so the
    wrap is the identity.
    """
    am = F.pmod(a.cast("long"), F.lit(1 << bits))
    bm = F.pmod(b.cast("long"), F.lit(1 << bits))
    key = F.lit(0).cast("long")
    for j in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(am, j) % 2, 2 * j)
            + F.shiftleft(F.shiftright(bm, j) % 2, 2 * j + 1)
        )
    return key


def bucketed_write(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a Spark bucketed + in-bucket-sorted table on
    ``key`` — the layout device that makes repeated big joins and
    aggregations on that key SHUFFLE-FREE: every table bucketed into the
    same (key, n_buckets) scheme exposes a hash output-partitioning the
    join's required distribution is satisfied by, so SortMergeJoin runs
    with ZERO Exchange. This is the 100 TB answer to 'the fact⋈fact join
    shuffles 100 TB every run': pay the shuffle once at ingest, never
    again per query
    (tests/test_physical_plans.py::test_bucketed_join_is_shuffle_free).

    The join still shows partition-local Sorts: Spark 3+ ignores the
    bucket sort order on read unless the legacy
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` conf is set —
    those sorts are per-bucket in-memory work, not data movement. sortBy
    is kept anyway (min/max row-group stats + forward-compat).

    ``path`` makes it an external table (tests point it at a tmp dir so
    nothing lands in the default warehouse).
    """
    # one file per bucket: repartition on the SAME hash first — a bucket
    # split across files forfeits the sorted-bucket guarantee and Spark
    # would re-Sort both sides of every merge join
    writer = (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def zorder_write(
    df: DataFrame, path: str, a_col: str, b_col: str, n_files: int = 8, bits: int = 10
) -> None:
    """Write ``df`` clustered by the Z-order of (a_col, b_col):
    range-partition on the morton key so each output file covers a
    compact Z-curve segment (narrow min/max on BOTH columns), then drop
    the key — it is a layout device, not data. The skipping benefit is
    measured in tests/test_relational.py against a linear sort layout
    using the files' own parquet footer stats."""
    keyed = df.withColumn("_zkey", zorder_key(F.col(a_col), F.col(b_col), bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
