"""Differential tests: every registry query vs its DuckDB oracle
(mirrors the driver's correctness gate — row count + column names +
order-insensitive values)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_ORACLE


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # cross-engine float equality at the declared 6dp contract
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # key=repr: NULLs and mixed types aren't order-comparable in Python,
    # but any deterministic key sorts equal multisets identically
    return sorted((tuple(_norm_cell(r[i]) for i in idx) for r in rows), key=repr)


def _registry():
    from vector_database_spark.queries import ORACLES, QUERIES

    return QUERIES, ORACLES


QUERIES, ORACLES = _registry()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    qfn = QUERIES[name]
    sdf = qfn(spark, SF_ORACLE)
    # driver-canonicalizer tripwire: list/map/struct cells are unhashable
    # in the grading driver's pandas compare (the q_loss_mask /
    # q_quantize_int8 / q_stateful_topk bug class — serialize to
    # space-joined strings instead, FIXTURES.md rule)
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: oracle-backed query emits non-scalar columns "
        f"{complex_cols} — the driver canonicalizer cannot hash them"
    )
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sn, dn = _rows(srows, scols), _rows(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b][:5]
    assert sn == dn, f"{name}: first mismatched sorted-rows at {mism}: " + "; ".join(
        f"spark={sn[i]} duck={dn[i]}" for i in mism
    )


def test_rows_only_queries_run(spark):
    """Approximate operators have no oracle but must run and return rows."""
    from vector_database_spark.queries import QUERIES

    for name in ("q_knn_lsh", "q_knn_ivf"):
        df = QUERIES[name](spark, SF_ORACLE)
        assert df.count() > 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"qid", "vec_id", "label", "score"}
