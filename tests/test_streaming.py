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


def test_stateful_running_totals_v2_gate_or_parity(spark):
    """The Spark 4 state-v2 twin (transformWithStateInPandas): when the
    protobuf runtime is present it must match the batch groupBy exactly
    (same assertions as the v1 test); when absent — this container — the
    operator must fail UP FRONT with the documented RuntimeError instead of
    Spark's opaque mid-stream runner crash. Either branch executes real
    operator code, so the v2 path is never silently untested."""
    import pytest

    ok, why = se.tws_available()
    if not ok:
        with pytest.raises(RuntimeError, match="transformWithStateInPandas"):
            se.stateful_running_totals_v2(spark, SF_SMALL)
        pytest.skip(f"protobuf runtime absent ({why}); up-front gate verified")
    got = {
        r["event_type"]: (r["n"], r["total"])
        for r in se.stateful_running_totals_v2(spark, SF_SMALL).collect()
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


def _write_event_files(spark, tmp_path, batches):
    """Write each batch (list of event tuples) as its own parquet file with
    increasing mtimes so the file stream source picks them up as separate
    micro-batches (maxFilesPerTrigger=1)."""
    import os
    import time as _t

    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        part = str(tmp_path / f"part{i}")
        df.coalesce(1).write.mode("overwrite").parquet(part)
        import glob
        import shutil

        f = glob.glob(part + "/part-*.parquet")[0]
        dest = os.path.join(src, f"batch{i}.parquet")
        shutil.copy(f, dest)
        os.utime(dest, (_t.time() + i, _t.time() + i))
    return src


def test_stateful_totals_across_micro_batches(spark, tmp_path):
    """Explicit state must accumulate across micro-batches, not per batch."""
    from datetime import datetime

    b0 = [(1, datetime(2024, 1, 1, 0, 0), 1, "click", 1.0, "{}"),
          (2, datetime(2024, 1, 1, 0, 1), 1, "click", 2.0, "{}")]
    b1 = [(3, datetime(2024, 1, 1, 0, 2), 1, "click", 3.0, "{}"),
          (4, datetime(2024, 1, 1, 0, 3), 1, "view", 5.0, "{}")]
    src = _write_event_files(spark, tmp_path, [b0, b1])

    import uuid

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField("event_type", T.StringType()), T.StructField("n", T.LongType()),
         T.StructField("total", T.DoubleType())]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"event_type": [key[0]], "n": [n], "total": [total]})

    name = "mb_" + uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.groupBy("event_type")
        .applyInPandasWithState(update, out_schema, state_schema, "update", "NoTimeout")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table(name).collect()
    # click was emitted in ≥2 batches; the LAST emission must be the
    # accumulated total (3 events, 6.0), proving state carried over
    click_rows = [(r["n"], r["total"]) for r in rows if r["event_type"] == "click"]
    assert click_rows[-1] == (3, 6.0)
    assert (1, 5.0) in [(r["n"], r["total"]) for r in rows if r["event_type"] == "view"]


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Append-mode windowed agg with a watermark must drop events that
    arrive after the watermark passed their window."""
    from datetime import datetime

    # Spark's drop guarantee applies only once the window's state has been
    # EVICTED (watermark passed it at a batch boundary), so the late row is
    # delivered two batches after its window:
    #   b0 advances event time to 03:00 (watermark → 02:50)
    #   b1 (05:00) closes+emits the 00:00 window with n=1 (watermark → 04:50)
    #   b2 delivers the 3h-late event for 00:00 — state is gone → dropped
    b0 = [(1, datetime(2024, 1, 1, 0, 5), 1, "click", 1.0, "{}"),
          (2, datetime(2024, 1, 1, 3, 0), 1, "click", 1.0, "{}")]
    b1 = [(3, datetime(2024, 1, 1, 5, 0), 1, "click", 1.0, "{}")]
    b2 = [(4, datetime(2024, 1, 1, 0, 10), 1, "click", 1.0, "{}"),
          (5, datetime(2024, 1, 1, 7, 0), 1, "click", 1.0, "{}")]
    src = _write_event_files(spark, tmp_path, [b0, b1, b2])

    import uuid

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"), "n")
    )
    name = "wm_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    q.processAllAvailable()
    q.stop()
    rows = [(r["hour"], r["n"]) for r in spark.table(name).collect()]
    # the 00:00 window was emitted exactly once, with only the on-time row —
    # the late event_id=4 was dropped, not re-emitted
    assert rows.count(("2024-01-01 00:00:00", 1)) == 1
    assert ("2024-01-01 00:00:00", 2) not in rows


def test_foreachbatch_upsert_into_collection(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cols"))
    # dot metric: event values are magnitudes, 0.0 is legal (a cosine
    # collection would kill the stream on zero-norm ingest validation)
    col = cat.create_collection("events_vec", dim=1, metric="dot")
    n_batches = se.stream_upsert_collection(spark, SF_SMALL, col)
    assert n_batches >= 1
    n_events = read_table(spark, SF_SMALL, "events").count()
    assert col.count() == n_events
    # payload carried through
    row = col.df().filter(F.col("id") == 0).collect()[0]
    assert "event_type" in row["payload"]


def test_stateful_topk_matches_batch_window(spark):
    from pyspark.sql.window import Window

    got = {
        r["event_type"]: (list(r["top_ids"]), list(r["top_values_micro"]))
        for r in se.stateful_topk(spark, SF_SMALL).collect()
    }
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    batch = (
        read_table(spark, SF_SMALL, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    expect: dict = {}
    for r in batch.orderBy("event_type", "rn").collect():
        ids, micros = expect.setdefault(r["event_type"], ([], []))
        ids.append(r["event_id"])
        from vector_database_spark.functions.vector import py_micro6

        micros.append(py_micro6(r["value"]))
    assert got == expect


def test_stream_stream_join_within_watermark(spark, tmp_path):
    """Stream-stream inner join: click events join view events of the same
    user within a time bound — both sides watermarked so Spark can evict
    join state (the last streaming primitive the presence map lists)."""
    from datetime import datetime

    b0 = [(1, datetime(2024, 1, 1, 0, 0), 10, "view", 1.0, "{}"),
          (2, datetime(2024, 1, 1, 0, 2), 10, "click", 1.0, "{}"),
          (3, datetime(2024, 1, 1, 0, 5), 20, "view", 1.0, "{}")]
    b1 = [(4, datetime(2024, 1, 1, 0, 30), 20, "click", 1.0, "{}"),  # 25 min after view: outside bound
          (5, datetime(2024, 1, 1, 0, 6), 20, "click", 1.0, "{}")]   # 1 min after: inside
    src = _write_event_files(spark, tmp_path, [b0, b1])

    import uuid

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    views = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        .filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
                F.col("event_id").alias("v_id"))
        .withWatermark("v_ts", "1 hour")
    )
    clicks = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
                F.col("event_id").alias("c_id"))
        .withWatermark("c_ts", "1 hour")
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user = c_user AND c_ts >= v_ts AND c_ts <= v_ts + interval 10 minutes"
        ),
    )
    name = "ssj_" + uuid.uuid4().hex[:8]
    q = (
        joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    q.processAllAvailable()
    q.stop()
    pairs = {(r["v_id"], r["c_id"]) for r in spark.table(name).collect()}
    # view 1 → click 2 (2 min later, same user); view 3 → click 5 (1 min);
    # click 4 is 25 min after view 3 — outside the 10-minute bound
    assert pairs == {(1, 2), (3, 5)}


def test_points_feed_stream_source(spark, tmp_path):
    # custom Python streaming DataSource: offsets advance batch_points per
    # micro-batch, the feed caps at max_points, and the accumulated sink
    # holds exactly the deterministic id range
    from vector_database_spark.sources.points_jsonl import PointsFeedDataSource

    spark.dataSource.register(PointsFeedDataSource)
    name = "points_feed_out"
    q = (
        spark.readStream.format("points_feed")
        .option("batch_points", "250")
        .option("max_points", "600")
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        # the feed self-caps at max_points: once read() returns an empty
        # batch at the cap, processAllAvailable unblocks
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert sorted(r["id"] for r in rows) == list(range(600))
    by_id = {r["id"]: r for r in rows}
    assert by_id[7]["payload"]["label"] == "7"
    assert len(by_id[3]["vector"]) == 8


def test_points_feed_streams_into_collection(spark, tmp_path):
    # full streaming-ingest lifecycle: custom streaming source -> micro
    # batches -> foreachBatch versioned upsert into a collection — the
    # reference's batched ingest loop (vector_db.py:94-106) as an
    # unbounded stream over the Python DataSource API
    from vector_database_spark.catalog import Catalog
    from vector_database_spark.sources import points_jsonl

    points_jsonl.register(spark)
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_collection("feed", dim=8, metric="dot")
    col = cat.collection("feed")

    def sink(batch_df, epoch_id):
        pts = batch_df.select(
            "id", F.col("vector").alias("embedding"), "payload"
        )
        if pts.take(1):
            col.upsert(pts)

    q = (
        spark.readStream.format("points_feed")
        .option("batch_points", "200")
        .option("max_points", "500")
        .load()
        .writeStream.foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert col.count() == 500
    got = col.get(123)
    assert got is not None and got["payload"]["label"] == "3"
    # micro-batches arrived as separate versions (log-structured ingest)
    assert col.info.version >= 2


def test_streaming_dedup_on_ingest_drops_semantic_dups(spark, tmp_path):
    """Streaming ingest with SEMANTIC dedup-on-ingest: each micro-batch
    is checked against the live collection (near_duplicates) and only
    fresh points upsert — the composition a crawl-ingest pipeline runs.
    The feed is driven twice: the second pass replays the same points,
    so every one of them must be flagged against the now-live corpus
    and the collection must not grow."""
    from vector_database_spark.catalog import Catalog
    from vector_database_spark.sources import points_jsonl

    points_jsonl.register(spark)
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_collection("dedup_feed", dim=8, metric="cosine")
    col = cat.collection("dedup_feed")

    def sink(batch_df, epoch_id):
        pts = batch_df.select(
            "id", F.col("vector").alias("embedding"), "payload"
        )
        if not pts.take(1):
            return
        if col.count() > 0:
            dups = col.near_duplicates(pts)
            pts = pts.join(
                dups.select(F.col("batch_id").alias("id")).distinct(),
                "id",
                "left_anti",
            )
        if pts.take(1):
            col.upsert(pts)

    def run_feed():
        q = (
            spark.readStream.format("points_feed")
            .option("batch_points", "100")
            .option("max_points", "300")
            .load()
            .writeStream.foreachBatch(sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_feed()
    n_first = col.count()
    assert n_first > 0
    v_first = col.info.version
    # replay: every point is now a semantic dup of a live point (the
    # feed is deterministic) — nothing fresh remains, nothing upserts
    run_feed()
    assert col.count() == n_first
    assert cat.collection("dedup_feed").info.version == v_first


def test_streaming_text_dedup_maintains_persisted_minhash_index(spark, tmp_path):
    """Streaming TEXT ingest with MinHash dedup-on-ingest against a
    PERSISTED wide signature index maintained per micro-batch — the
    at-rest-index loop the incremental_dedup docstrings point at: each
    batch is checked with incremental_dedup_auto against the corpus +
    index + APPEND-MAINTAINED band-count companion, and only fresh docs
    append (text, minhash_index_signatures rows, and their own band
    counts — additive, so no per-batch re-aggregation — in lockstep).
    Deterministic feed:
    doc ids >= 100 with id % 3 == 0 carry a prior-BATCH doc's token set
    plus one token (J = 15/16 — found via the index, never re-signing
    the corpus); a full replay (fresh ids, same texts) must admit
    nothing."""
    import os

    from vector_database_spark.operators import dedup
    from vector_database_spark.sources import points_jsonl

    points_jsonl.register(spark)
    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "index")
    counts_path = str(tmp_path / "band_counts")

    def text_of(fid):
        # ids ≡ 0 (mod 3) past the first batch copy id-100's tokens
        # (id-100 ≡ 2 mod 3, so bases are never themselves copies) plus
        # ' zz'; token SETS make any would-be chain collapse to one zz
        is_copy = (fid >= 100) & (fid % 3 == 0)
        base = F.when(is_copy, fid - 100).otherwise(fid)
        words = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(15)),
                lambda j: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(base, j), F.lit(5000))
                ),
            ),
        )
        return F.when(is_copy, F.concat(words, F.lit(" zz"))).otherwise(words)

    def make_sink(id_offset):
        def sink(batch_df, epoch_id):
            fid = F.col("id").cast("long")
            docs = batch_df.select(
                (fid + F.lit(id_offset)).alias("doc_id"),
                text_of(fid).alias("text"),
            )
            if not docs.take(1):
                return
            if os.path.exists(index_path):
                corpus = spark.read.parquet(corpus_path)
                idx = spark.read.parquet(index_path)
                verdict = dedup.incremental_dedup_auto(
                    docs, corpus, corpus_index=idx,
                    corpus_band_counts=spark.read.parquet(counts_path),
                )
                docs = docs.join(
                    verdict.filter(~F.col("is_dup")).select("doc_id"),
                    "doc_id",
                    "semi",
                )
            if docs.take(1):
                docs.write.mode("append").parquet(corpus_path)
                sigs = dedup.minhash_index_signatures(docs)
                sigs.write.mode("append").parquet(index_path)
                # the companion is append-maintainable (counts are
                # additive; the probe sums over duplicate keys) — each
                # batch appends its OWN band counts, no re-aggregation
                dedup.minhash_index_band_counts(sigs).write.mode(
                    "append"
                ).parquet(counts_path)

        return sink

    def run_feed(id_offset):
        q = (
            spark.readStream.format("points_feed")
            .option("batch_points", "100")
            .option("max_points", "300")
            .load()
            .writeStream.foreachBatch(make_sink(id_offset))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_feed(0)
    corpus = spark.read.parquet(corpus_path)
    # 66 planted cross-batch near-copies (ids 102..297 step 3) flagged
    assert corpus.count() == 300 - 66
    assert corpus.filter((F.col("doc_id") >= 100) & (F.col("doc_id") % 3 == 0)).count() == 0
    # the index tracks the corpus in lockstep
    idx = spark.read.parquet(index_path)
    assert idx.count() == corpus.count()
    assert f"h{dedup.INDEX_NUM_HASHES - 1}" in idx.columns
    # replay with fresh ids: every text is already live — nothing admits
    run_feed(100_000)
    assert spark.read.parquet(corpus_path).count() == 300 - 66
    assert spark.read.parquet(index_path).count() == 300 - 66
    # the append-maintained companion, folded over duplicate keys, must
    # equal a from-scratch rebuild over the final index
    appended = (
        spark.read.parquet(counts_path)
        .groupBy("__nh", "__nb", "band_key")
        .agg(F.sum("n").alias("n"))
    )
    rebuilt = dedup.minhash_index_band_counts(spark.read.parquet(index_path))
    assert appended.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(appended).count() == 0


def test_tws_probe_requires_preexported_shim_env(monkeypatch):
    """r8 ADVICE: with the VENDORED protobuf importable in the driver but
    SPARK_GRAFT_PB_SHIM never exported before the JVM launched, the probe
    must return ok=False (the python workers would die mid-stream with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The r7 guard matched
    the dotted substring "google.protobuf" against a filesystem PATH —
    always False, so the branch was dead and the probe said ok=True."""
    from vector_database_spark.compat import pb_shim

    if not pb_shim.enable_driver():
        import pytest

        pytest.skip("no protobuf importable at all — guard unreachable")
    from google.protobuf import descriptor

    if "google-cloud-sdk" not in str(getattr(descriptor, "__file__", "")):
        import pytest

        pytest.skip("real protobuf install — the vendored guard is moot")
    monkeypatch.delenv("SPARK_GRAFT_PB_SHIM", raising=False)
    ok, why = se.tws_available()
    assert not ok
    assert "SPARK_GRAFT_PB_SHIM" in why

    monkeypatch.setenv("SPARK_GRAFT_PB_SHIM", "1")
    ok, _ = se.tws_available()
    assert ok
