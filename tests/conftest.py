from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# state-v2 protobuf shim (round-7 directive 6): when no real
# google.protobuf exists but the host vendors a pure-Python runtime,
# export the worker-side shim env NOW — at conftest import, before any
# fixture launches the JVM — so Spark python workers inherit it and the
# transformWithStateInPandas parity test can actually run (see
# vector_database_spark/compat/pb_shim.py).
from vector_database_spark.compat import pb_shim as _pb_shim  # noqa: E402

os.environ.update(_pb_shim.worker_env())

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from vector_database_spark.session import get_spark

    s = get_spark("tests", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    return con
