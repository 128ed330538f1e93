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


# ---------------------------------------------------------------------------
# Custom Python DataSource (Spark 4 API): Qdrant-style points as JSONL
# ---------------------------------------------------------------------------


def _register_points_ds(spark):
    from vector_database_spark.sources import points_jsonl

    points_jsonl.register(spark)


def test_points_jsonl_roundtrip_and_partitioning(spark, tmp_path):
    _register_points_ds(spark)
    emb = read_table(spark, SF_SMALL, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
        F.create_map(F.lit("label"), F.col("label").cast("string")).alias("payload"),
    )
    path = str(tmp_path / "points")
    pts.repartition(4).write.format("points_jsonl").mode("append").save(path)

    back = spark.read.format("points_jsonl").load(path)
    # one input partition per shard file — parallelism follows the layout
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == pts.count()
    a = {r["id"]: (r["vector"], r["payload"]["label"]) for r in pts.collect()}
    b = {r["id"]: (r["vector"], r["payload"]["label"]) for r in back.collect()}
    assert a == b
    # job-commit protocol: no uncommitted temp shards remain
    import os

    assert not [f for f in os.listdir(path) if f.endswith(".tmp")]


def test_points_jsonl_filter_pushdown(spark, tmp_path):
    _register_points_ds(spark)
    pts = spark.createDataFrame(
        [(i, [float(i)], {"k": "v"}) for i in range(50)],
        "id long, vector array<float>, payload map<string,string>",
    )
    path = str(tmp_path / "pts")
    pts.write.format("points_jsonl").mode("append").save(path)
    back = spark.read.format("points_jsonl").load(path)
    flt = back.filter((F.col("id") >= 10) & (F.col("id") < 20))
    assert sorted(r["id"] for r in flt.collect()) == list(range(10, 20))
    # the id-range predicates are consumed by the Python reader: the only
    # filter left above the scan is the isnotnull the reader declined
    plan = flt._jdf.queryExecution().executedPlan().toString()
    body = plan.split("BatchScan")[0]
    assert "isnotnull" in body
    assert ">= 10" not in body and "< 20" not in body
