"""SparkSession factory.

Local-mode settings mirror what a cluster deployment would tune per-node:
AQE on (runtime re-planning, skew-join handling, partition coalescing),
shuffle partitions sized to cores (not the 200 default), UTC session
timezone so timestamp semantics agree with the DuckDB oracle, and Arrow
enabled for the Pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vector_database_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or 32 — test/bench harness contract.
    On a real cluster the same configs apply; only ``master`` changes.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # make this package importable in executor Python workers regardless of
    # the driver process cwd (pickled UDF closures reference it by module)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # older fixture events.parquet stored TIMESTAMP(NANOS); kept for
        # compatibility — the table loader normalizes either form to a
        # UTC micros timestamp (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # state-v2 protobuf shim (compat/pb_shim.py): when no real
    # google.protobuf exists but the host vendors a pure-Python runtime,
    # export the shim to python workers via spark.executorEnv.* — that is
    # what feeds sc.environment → PythonFunction.envVars → the streaming
    # runner's env (works in local mode too, unlike the JVM env, which is
    # frozen at JVM launch). No-op when protobuf is installed for real.
    from vector_database_spark.compat import pb_shim

    for k, v in pb_shim.worker_env().items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
        if k != "PYTHONPATH":  # flag the driver side too (tws_available)
            os.environ.setdefault(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
