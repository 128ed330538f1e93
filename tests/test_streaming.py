"""Structured Streaming tests: windowed agg equals batch twin, streaming
dedup, foreachBatch upsert into a collection (SURVEY §2.E streaming row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vector_database_spark.catalog import Catalog
from vector_database_spark.operators.relational import event_window
from vector_database_spark.sources.tables import read_table
from vector_database_spark.streaming import events as se


def test_stream_window_equals_batch_twin(spark):
    stream_out = se.run_stream_to_batch(spark, SF_SMALL)
    batch = event_window(read_table(spark, SF_SMALL, "events")).select(
        "hour", "event_type", "n", "sum_value"
    )
    s = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_stream_dedup(spark):
    out = []

    def _sink(df, epoch):
        out.append(df.count())

    q = (
        se.dedup_stream(se.read_events_stream(spark, SF_SMALL))
        .writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_distinct = (
        read_table(spark, SF_SMALL, "events").select("event_id").distinct().count()
    )
    assert sum(out) == n_distinct


def test_stateful_running_totals(spark):
    got = {
        r["event_type"]: (r["n"], r["total"])
        for r in se.stateful_running_totals(spark, SF_SMALL).collect()
    }
    expect = {
        r["event_type"]: (r["n"], round(r["s"], 6))
        for r in read_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0]
        assert abs(got[k][1] - expect[k][1]) < 1e-3


def test_foreachbatch_upsert_into_collection(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cols"))
    col = cat.create_collection("events_vec", dim=1)
    n_batches = se.stream_upsert_collection(spark, SF_SMALL, col)
    assert n_batches >= 1
    n_events = read_table(spark, SF_SMALL, "events").count()
    assert col.count() == n_events
    # payload carried through
    row = col.df().filter(F.col("id") == 0).collect()[0]
    assert "event_type" in row["payload"]
