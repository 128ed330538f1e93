"""Error-bound gates for the DataSketches queries (q_hll_distinct,
q_kll_quantiles, q_theta_overlap). Approximate estimates have no DuckDB
oracle — the contract here is the sketch's published error bound against
the exact answer, plus the mergeability property the queries rely on."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _exact_distinct_users(duck):
    rows = duck.sql(
        "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
    ).fetchall()
    per = dict(rows)
    total = duck.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    return per, total


def test_hll_distinct_within_bound(spark, duck):
    from vector_database_spark.queries import q_hll_distinct

    got = {r["event_type"]: r["approx_users"] for r in q_hll_distinct(spark, SF_SMALL).collect()}
    per, total = _exact_distinct_users(duck)
    # lgConfigK=14 → rsd ≈ 1.04/sqrt(2^14) ≈ 0.8%; gate at 5% (and HLL is
    # exact in sparse mode at fixture cardinalities, so this is headroom)
    for et, exact in per.items():
        assert abs(got[et] - exact) <= max(1, 0.05 * exact), et
    assert abs(got["__total__"] - total) <= max(1, 0.05 * total)


def test_hll_merge_equals_global_sketch(spark):
    # the property q_hll_distinct's '__total__' row rests on: union of
    # per-group sketches == sketch of the whole column
    from pyspark.sql import functions as F
    from vector_database_spark.sources.tables import read_table

    ev = read_table(spark, SF_SMALL, "events")
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("d"))
        .collect()[0]["d"]
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("d")
    ).collect()[0]["d"]
    assert merged == direct


def test_kll_quantiles_rank_error(spark, duck):
    from vector_database_spark.queries import q_kll_quantiles

    rows = q_kll_quantiles(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        vals = [
            v[0]
            for v in duck.sql(
                "SELECT value FROM events WHERE event_type = ? ORDER BY value",
                params=[r["event_type"]],
            ).fetchall()
        ]
        n = len(vals)
        assert r["n"] == n
        for q, v in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            got = r[q]
            # rank of the returned value must be within ±2% of the target
            # rank (k=200 → 1.65% @99% conf) — and the value must be an
            # actual data point, not an interpolation
            rank = sum(1 for x in vals if x <= got) / n
            assert abs(rank - v) <= 0.02 + 1.0 / n, (r["event_type"], q, rank)
            assert any(abs(x - got) < 1e-9 for x in vals), (r["event_type"], q)


def test_theta_overlap_within_bound(spark, duck):
    from vector_database_spark.queries import q_theta_overlap

    row = q_theta_overlap(spark, SF_SMALL).collect()
    assert len(row) == 1
    row = row[0]
    ex = duck.sql(
        """
        WITH t AS (
          SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
          FROM documents WHERE source IN ('src0', 'src1')
        ),
        a AS (SELECT DISTINCT tok FROM t WHERE source = 'src0'),
        b AS (SELECT DISTINCT tok FROM t WHERE source = 'src1')
        SELECT (SELECT count(*) FROM a) AS na,
               (SELECT count(*) FROM b) AS nb,
               (SELECT count(*) FROM (SELECT tok FROM a UNION SELECT tok FROM b)) AS nu,
               (SELECT count(*) FROM (SELECT tok FROM a INTERSECT SELECT tok FROM b)) AS ni,
               (SELECT count(*) FROM (SELECT tok FROM a EXCEPT SELECT tok FROM b)) AS nd
        """
    ).fetchone()
    na, nb, nu, ni, nd = ex
    for got, exact in (
        (row["approx_a"], na),
        (row["approx_b"], nb),
        (row["approx_union"], nu),
        (row["approx_intersect"], ni),
        (row["approx_only_a"], nd),
    ):
        assert abs(got - exact) <= max(2, 0.05 * exact), (got, exact)
    assert 0 <= row["jaccard_micro"] <= 1_000_000


@pytest.mark.parametrize("name", ["q_hll_distinct", "q_theta_overlap"])
def test_sketch_queries_deterministic(spark, name):
    # HLL/theta inserts are order-independent (register max / hash set);
    # two runs over different partitionings must agree exactly. KLL is
    # deliberately absent: DataSketches KLL compaction flips random bits,
    # so repeated runs return different (equally rank-valid) retained
    # items — the rank-error gate above is its correctness contract.
    from vector_database_spark.queries import QUERIES

    a = [tuple(r) for r in QUERIES[name](spark, SF_SMALL).collect()]
    b = [tuple(r) for r in QUERIES[name](spark, SF_SMALL).collect()]
    assert a == b
