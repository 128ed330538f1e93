"""Fixture table loaders.

``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` the
column arrives as BIGINT nanoseconds and is converted here to a micros
timestamp with integer arithmetic (``div`` — a double division would lose
precision above 2^53). DuckDB truncates nanos→micros the same way, so the
engines agree to the microsecond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Analyzed-relation memo (r11, guide §6): spark.read.parquet infers the
# schema with a driver-side listing + footer read on EVERY call, and the
# bench resolves each fixture table hundreds of times per process. The
# memo returns the SAME DataFrame object per (session, dir, table) — a
# logical plan, no data is cached or persisted; every action still
# computes from the parquet files. Invalidation: an entry is dropped when
# its SparkSession is no longer the caller's (identity check, like the
# query-level index memos). Caveat (documented): a caller that REWRITES a
# parquet path mid-session and re-reads it through this function would
# see the first read's file listing — the fixture dirs this loader exists
# for are immutable, and test writers use fresh temp paths.
_TABLE_MEMO: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    # normpath so "dir" and "dir/" share one entry (r12, ADVICE r11);
    # dead-session entries are evicted whenever they are seen, not only
    # on a same-key re-read, bounding the memo across session restarts
    key = (os.path.normpath(sf_dir), name)
    got = _TABLE_MEMO.get(key)
    if got is not None:
        if got[0] is spark:
            return got[1]
        del _TABLE_MEMO[key]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        kind = dict(df.dtypes).get("ts")
        if kind == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif kind == "timestamp_ntz":
            # Fixture regenerated as TIMESTAMP(MICROS) without tz → Spark
            # infers TIMESTAMP_NTZ, which Spark 4 refuses to cast to
            # BIGINT. Interpret the naive wall clock as UTC (exactly
            # DuckDB's epoch() semantics for naive timestamps). NOTE: the
            # NTZ→LTZ step inside to_utc_timestamp uses the SESSION
            # timezone, so this is only UTC-correct because session.get_spark
            # pins spark.sql.session.timeZone=UTC — asserted here so a
            # foreign session can't silently shift every event timestamp.
            assert spark.conf.get("spark.sql.session.timeZone") == "UTC", (
                "events NTZ loader requires spark.sql.session.timeZone=UTC "
                "(see vector_database_spark.session.get_spark)"
            )
            df = df.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
    _TABLE_MEMO[key] = (spark, df)
    return df
