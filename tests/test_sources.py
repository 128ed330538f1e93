"""Source/sink format coverage (SURVEY §2.E sources row): parquet is the
primary format everywhere; these tests prove the same DataFrames round-trip
through json and csv sinks/sources and that the binaryFile source reads
opaque blobs (the ingest shape for multimodal columns)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vector_database_spark.sources.tables import read_table


def test_json_roundtrip(spark, tmp_path):
    docs = read_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "docs_json")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(docs.schema).json(path)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_csv_roundtrip(spark, tmp_path):
    li = read_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_csv")
    li.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(
        "l_orderkey long, l_linenumber int, l_quantity double, l_returnflag string"
    ).option("header", True).csv(path)
    assert back.count() == li.count()
    assert back.agg(F.sum("l_quantity")).collect()[0][0] == li.agg(
        F.sum("l_quantity")
    ).collect()[0][0]


def test_binaryfile_source_reads_blobs(spark):
    """binaryFile is the at-scale ingest source for image/audio blobs
    (multimodal north-star); here it reads the parquet files themselves as
    opaque content + metadata."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(SF_SMALL)
    )
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 10  # one per fixture table
    for r in rows:
        assert r["length"] > 0 and bytes(r["content"][:4]) == b"PAR1"


def test_orc_roundtrip(spark, tmp_path):
    # ORC is the second columnar format Spark ships natively; a collection
    # (or export sink) can swap parquet for ORC with no engine change
    docs = read_table(spark, SF_SMALL, "documents")
    p = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.count() == docs.count()
    assert dict(back.dtypes) == dict(docs.dtypes)
    # pushdown survives the format swap
    plan = (
        back.filter(back.lang == "en")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters")[1][:120]
