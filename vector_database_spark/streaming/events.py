"""Structured Streaming ingest over the events table (north-star extension;
the reference is wholly batch — SURVEY §2.E streaming row).

Patterns implemented:
  - windowed aggregation with watermark (late-data policy)
  - streaming dedup on the event_id key within the watermark
  - foreachBatch upsert into a collection (the streaming twin of
    vector_db.py:94-106 batched upserts)

For tests, the parquet fixture dir drives a file-source stream to
completion synchronously (memory sink + processAllAvailable). ``complete``
output mode is used for the windowed agg so the final state matches the
batch twin (operators/relational.py::event_window) exactly; in production
(append mode + downstream sink) the watermark bounds state size.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet fixture.

    The stream schema must be declared up front, but the fixture has
    shipped in two encodings across driver rounds — TIMESTAMP(NANOS)
    (arrives as BIGINT nanos under the nanosAsLong conf) and
    TIMESTAMP(MICROS) without timezone (arrives as TIMESTAMP_NTZ). One
    cheap batch-read of the file's footer decides which schema to
    declare; both normalize to a UTC micros timestamp, mirroring
    sources/tables.py so batch and streaming agree."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    kind = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes).get("ts")
    if kind == "bigint":
        schema, fix = T.LongType(), F.expr("timestamp_micros(ts div 1000)")
    else:
        schema, fix = T.TimestampNTZType(), F.to_utc_timestamp(F.col("ts"), "UTC")
    # the file source wants a directory; select just the events file by glob
    return (
        spark.readStream.schema(_events_schema(schema))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumn("ts", fix)
    )


def windowed_agg(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Hourly tumbling window x event_type with a watermark for late data."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6).alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on the event key within the watermark horizon
    (the streaming twin of F1 exact dedup).

    dropDuplicatesWithinWatermark is required for bounded state: a plain
    dropDuplicates(["event_id"]) would ignore the watermark (the event-time
    column isn't in the key subset) and grow state forever.
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive streaming dedup end-to-end with REAL duplicates: the events
    fixture is streamed through TWO file sources unioned (every event
    arrives exactly twice), then dropDuplicatesWithinWatermark keeps one
    survivor per event_id. Because the duplicate copies are byte-identical
    (same file) the survivor set equals the batch DISTINCT — a FULL
    oracle for watermarked streaming dedup (event_id is unique in every
    fixture scale, so the oracle is simply the events table).

    State stays bounded: each key's entry is dropped once the watermark
    passes its event time — the stream can run forever; a plain
    dropDuplicates would grow state monotonically (see dedup_stream).
    """
    doubled = read_events_stream(spark, sf_dir).union(
        read_events_stream(spark, sf_dir)
    )
    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    q = (
        dedup_stream(doubled)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "user_id",
            "event_type",
            F.round(F.col("value"), 6).alias("value"),
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream inner-joined to a
    STATIC dimension (per-user tier derived once from the batch fixture —
    the broadcast-dim lookup every streaming ETL runs). Stream-static
    inner joins are stateless (each micro-batch probes the static side;
    no watermark needed), so the appended result equals the batch join:
    FULL oracle. At scale the static side is a broadcast or a bucketed
    table; Spark re-reads it per micro-batch, picking up dim updates.
    """
    from vector_database_spark.sources.tables import read_table

    tiers = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select("user_id", F.pmod(F.col("user_id"), F.lit(5)).alias("tier"))
    )
    enriched = (
        read_events_stream(spark, sf_dir)
        .join(F.broadcast(tiers), "user_id")
        .groupBy("tier", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("dec_sum"),
        )
        .select(
            "tier",
            "event_type",
            "n",
            F.round(F.col("dec_sum").cast("double"), 6).alias("sum_value"),
        )
    )
    name = "stream_enrich_" + uuid.uuid4().hex[:8]
    q = (
        enriched.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_to_batch(
    spark: SparkSession, sf_dir: str, mode: str = "complete"
) -> DataFrame:
    """Drive the windowed aggregation stream to completion and return the
    result as a batch DataFrame (memory sink). Used by the driver-facing
    ``q_stream_event_window`` entry; rows match the batch twin."""
    name = "stream_out_" + uuid.uuid4().hex[:8]
    q = (
        windowed_agg(read_events_stream(spark, sf_dir))
        .writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_session_windows(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming gap-based session windows in APPEND mode — the mode where
    watermark semantics actually bite: a session row is emitted only once
    its window end falls at or below the final watermark (max event time −
    delay), so sessions still open near the end of the stream are withheld.
    The other streaming queries here use complete/update modes, which
    re-emit state; this is the at-most-once, late-data-disciplined shape a
    downstream sink would consume.

    The oracle encodes the SAME semantics declaratively: batch gap
    sessions filtered to session_end ≤ max(ts) − watermark. Session window
    = [min(ts), max(ts) + gap) per burst of events with inter-event gaps
    < gap (Spark session_window semantics; the batch twin uses ≥ gap for
    a new session, identical boundaries).

    Boundary assumption: the oracle's ≤ is inclusive; whether Spark emits
    a session ending EXACTLY at the final watermark depends on its
    internal eviction predicate. A divergence needs a session whose
    max(ts)+gap lands on max(ts)−watermark to the microsecond — a
    measure-zero case the fixture (minute-scale gaps vs second-scale
    values) cannot produce; if a future fixture hits it, align the oracle
    by flipping to strict <."""
    name = "sess_out_" + uuid.uuid4().hex[:8]
    agg = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: a
    running (count, sum(value)) per event_type maintained in explicit state
    across micro-batches — the pattern for operators Structured Streaming
    lacks natively (SURVEY §2.E streaming row; north-star custom state).

    Returns the final per-key totals as a batch DataFrame (memory sink,
    update mode, stream driven to completion). With a single input file the
    totals equal the batch groupBy — asserted in tests/test_streaming.py.
    """
    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("micros", T.LongType())]
    )

    def update(key, pdfs, state):
        import pandas as pd

        from vector_database_spark.functions.vector import py_micro6

        # State accumulates INTEGER micro-units (py_micro6, the repo-wide
        # micro6 convention): the running sum is order-independent
        # across micro-batches and bit-identical to the DuckDB oracle's
        # sum(CAST(value AS DECIMAL(38,6))) — a raw float64 accumulation
        # would be an order-dependent IEEE sum that round(·, 6) can land on
        # either side of a boundary.
        n, micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            micros += sum(py_micro6(v) for v in pdf["value"])
        state.update((n, micros))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "total": [micros / 1e6]}
        )

    name = "stateful_out_" + uuid.uuid4().hex[:8]
    q = (
        read_events_stream(spark, sf_dir)
        .groupBy("event_type")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", "NoTimeout"
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one row per key per batch; the latest emission per
    # key is the one with the largest running count n (strictly increasing —
    # the update fn only fires for a key when the batch has rows for it).
    # Physical row order of the memory sink is NOT a documented contract, so
    # we deliberately don't order by it.
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy(F.col("n").desc())
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", "n", "total")
    )


def tws_available() -> tuple[bool, str]:
    """Can transformWithStateInPandas actually RUN here?

    The Spark 4 state-v2 python driver worker speaks the state-server
    protocol through generated protobuf code
    (pyspark/sql/streaming/proto/StateMessage_pb2.py), whose header pins a
    modern runtime (``Protobuf Python Version: 6.33.0`` with a
    ValidateProtobufRuntimeVersion gate). Importing StatefulProcessor
    succeeds WITHOUT protobuf — the failure only surfaces mid-stream as
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE when the runner process
    dies on ``from google.protobuf import descriptor`` — so callers must
    probe this BEFORE starting a query. Returns (ok, reason).

    Since round 7 the probe also tries the vendored-runtime shim
    (compat/pb_shim.py): a host-vendored pure-Python protobuf (the
    google-cloud-sdk ships 6.32.0) satisfies the DRIVER side directly;
    the python WORKERS additionally need the shim's sitecustomize dir on
    PYTHONPATH *before the JVM launched* (pb_shim.worker_env —
    tests/conftest.py sets it at import time), which this probe checks
    via the ``SPARK_GRAFT_PB_SHIM`` env flag."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        from google.protobuf import runtime_version  # noqa: F401

        # real install, or the shim already active in this process AND
        # exported to workers (env set pre-JVM by the caller's harness).
        # Vendored-runtime detection is by FILESYSTEM PATH — the module
        # file lives under .../google-cloud-sdk/.../google/protobuf/...
        # (an r7 version of this guard also required the DOTTED substring
        # "google.protobuf", which never occurs in a path, making the
        # whole branch dead: a driver with the shim imported but no
        # pre-JVM SPARK_GRAFT_PB_SHIM export probed ok=True and the
        # streaming query died mid-run — exactly what this probe exists
        # to prevent. r8 ADVICE fix; precedence test in
        # tests/test_streaming.py.)
        if "google-cloud-sdk" in str(getattr(descriptor, "__file__", "")):
            if not os.environ.get("SPARK_GRAFT_PB_SHIM"):
                return False, (
                    "vendored protobuf importable in the driver but the "
                    "worker-side shim env (SPARK_GRAFT_PB_SHIM + "
                    "sitecustomize on PYTHONPATH) was not set before the "
                    "JVM launched"
                )
        return True, ""
    except Exception as e:  # ImportError, or broken namespace pkg ValueError
        from vector_database_spark.compat import pb_shim

        if os.environ.get("SPARK_GRAFT_PB_SHIM") and pb_shim.enable_driver():
            return True, "vendored pure-Python protobuf via compat.pb_shim"
        return False, f"{type(e).__name__}: {e}"


def stateful_running_totals_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stateful_running_totals`` on the Spark 4 state-v2 API
    (transformWithStateInPandas + StatefulProcessor) — identical state
    semantics (integer micro6 accumulation, order-independent across
    micro-batches), same output contract, same latest-emission selection.

    This container has no protobuf runtime, so the v2 python runner cannot
    start (see tws_available); in that case this raises RuntimeError UP
    FRONT with the evidence, instead of Spark's opaque mid-stream
    runner-crash. tests/test_streaming.py executes the parity assertions
    whenever the runtime is present and the gate when it isn't — the v1
    twin above stays the portable default either way.
    """
    ok, why = tws_available()
    if not ok:
        raise RuntimeError(
            "transformWithStateInPandas needs a google.protobuf runtime "
            "matching PySpark's generated StateMessage_pb2 (>= 6.33 here); "
            f"probe failed with: {why}. Use stateful_running_totals (the "
            "applyInPandasWithState twin) on this environment."
        )

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("micros", T.LongType())]
    )

    class RunningTotals(StatefulProcessor):
        # same invariant as the v1 update fn: state holds INTEGER micro6
        # units so the running sum is order-independent and bit-identical
        # to the DECIMAL(38,6) oracle regardless of micro-batch boundaries
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            from vector_database_spark.functions.vector import py_micro6

            n, micros = self._tot.get() if self._tot.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                micros += sum(py_micro6(v) for v in pdf["value"])
            self._tot.update((n, micros))
            yield pd.DataFrame(
                {"event_type": [key[0]], "n": [n], "total": [micros / 1e6]}
            )

        def close(self) -> None:
            pass

    name = "stateful_v2_out_" + uuid.uuid4().hex[:8]
    # transformWithStateInPandas stores each state variable in its own
    # COLUMN FAMILY; the default HDFSBackedStateStoreProvider supports a
    # single family and rejects the query up front
    # (STATE_STORE_MULTIPLE_COLUMN_FAMILIES_NOT_SUPPORTED), so v2 queries
    # require the bundled RocksDB provider. Scoped set-and-restore: the
    # conf is read at query start, and the v1 operators stay on the
    # default provider.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            read_events_stream(spark, sf_dir)
            .groupBy("event_type")
            .transformWithStateInPandas(
                RunningTotals(),
                outputStructType=out_schema,
                outputMode="Update",
                timeMode="None",
            )
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy(F.col("n").desc())
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", "n", "total")
    )


def stateful_topk(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Custom stateful streaming operator: a running top-k (value, event_id)
    per event_type maintained in explicit state across micro-batches — a
    per-key leaderboard no built-in streaming aggregate expresses.

    The merge is order-independent (top-k under (value DESC, event_id ASC)
    is a semilattice join), so the final state equals the batch window twin
    exactly and the operator is fully oracle-checkable. Values are emitted
    in micro6 units; the latest emission per key is selected by the largest
    processed-row count, never physical sink order.

    Implementation note: written against applyInPandasWithState. The Spark
    4 successor API (transformWithStateInPandas) exists in this PySpark but
    its python runner needs a protobuf runtime the container doesn't ship
    (generated StateMessage_pb2 pins protobuf >= 6.33; see tws_available) —
    so the v1 API is the portable choice here. The v2 form of this operator
    family is implemented in stateful_running_totals_v2, gated up front.
    """
    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("top_ids", T.ArrayType(T.LongType())),
            T.StructField("top_values_micro", T.ArrayType(T.LongType())),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ids", T.ArrayType(T.LongType())),
            T.StructField("micros", T.ArrayType(T.LongType())),
            T.StructField("vals", T.ArrayType(T.DoubleType())),
            T.StructField("n", T.LongType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        from vector_database_spark.functions.vector import py_micro6

        if state.exists:
            ids, micros, vals, n = state.get
            ids, micros, vals = list(ids), list(micros), list(vals)
        else:
            ids, micros, vals, n = [], [], [], 0
        best = list(zip(vals, ids, micros))
        for pdf in pdfs:
            n += len(pdf)
            for v, i in zip(pdf["value"], pdf["event_id"]):
                v = float(v)
                best.append((v, int(i), py_micro6(v)))
        # (-value, id) ascending == (value DESC, id ASC) — the exact order
        # the batch window twin uses
        best.sort(key=lambda t: (-t[0], t[1]))
        best = best[:k]
        state.update(
            ([b[1] for b in best], [b[2] for b in best], [b[0] for b in best], n)
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n],
                "top_ids": [[b[1] for b in best]],
                "top_values_micro": [[b[2] for b in best]],
            }
        )

    name = "topk_out_" + uuid.uuid4().hex[:8]
    q = (
        read_events_stream(spark, sf_dir)
        .groupBy("event_type")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", "NoTimeout"
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy(F.col("n_seen").desc())
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", "top_ids", "top_values_micro")
    )


def stream_upsert_collection(spark: SparkSession, sf_dir: str, collection) -> int:
    """foreachBatch upsert: each micro-batch becomes a versioned upsert into
    a VectorCollection (streaming twin of the reference's batched ingest,
    vector_db.py:94-106). Returns number of micro-batches processed.

    The 1-d "embedding" is the raw event value — a magnitude, not a
    direction — so the target collection must use a metric whose ingest
    accepts zero ("dot" or "euclid"). A cosine collection would abort the
    whole stream on the first value == 0.0 event (zero-norm validation),
    which is the wrong invariant for this data; rejected up front.
    """
    if getattr(collection, "info", None) is not None and collection.info.metric == "cosine":
        raise ValueError(
            "stream_upsert_collection requires a non-cosine collection "
            "(metric='dot' or 'euclid'): event values are magnitudes and may "
            "legitimately be 0.0, which cosine ingest rejects as zero-norm"
        )
    batches = {"n": 0}

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        pts = batch_df.select(
            F.col("event_id").alias("id"),
            F.array(F.col("value").cast("float")).alias("embedding"),
            F.create_map(F.lit("event_type"), F.col("event_type")).alias("payload"),
        )
        if pts.take(1):
            collection.upsert(pts)
            batches["n"] += 1

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]


def stream_interval_join(
    spark: SparkSession,
    sf_dir: str,
    interval: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream event-time INTERVAL join: views joined to the same
    user's clicks landing within ``interval`` after the view, both sides
    watermarked — the attribution-join shape (ad view → click credit).
    The time-range predicate is what lets Structured Streaming bound the
    join state: each side keeps only rows younger than watermark +
    interval, so state is O(rate × window), not O(stream). Inner joins
    emit on match (the watermark gates state eviction, not emission), so
    the final appended table equals the batch join exactly — giving this
    streaming query a FULL oracle.
    """
    name = "ivj_out_" + uuid.uuid4().hex[:8]
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("value"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = views.join(
        clicks,
        F.expr(
            "user_id = c_user_id AND "
            f"click_ts >= view_ts AND click_ts <= view_ts + interval {interval}"
        ),
        "inner",
    ).select(
        "user_id",
        "view_id",
        "click_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_time"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.round(F.col("value"), 6).alias("click_value"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
