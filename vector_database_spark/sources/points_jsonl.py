"""Custom Python DataSource (Spark 4 DataSource API): Qdrant-style point
records as JSONL — the reference's interchange shape (PointStruct(id,
vector, payload), vector_db.py:85-91) as a first-class `spark.read.format`.

Demonstrates the full connector surface a 100 TB deployment needs from a
source: a declared schema, one input partition PER FILE (scan parallelism
scales with the dataset layout, not the driver), filter PUSHDOWN into the
reader (id range/equality predicates skip rows before they ever reach the
JVM — and a production reader would skip whole files on a manifest), and a
partitioned writer (one shard file per task, commit/abort protocol).

Register once per session via the module helper (NOT bare
``spark.dataSource.register``: the reader declares pushFilters, which
Spark refuses to run unless ``spark.sql.python.filterPushdown.enabled``
is on — ``register()`` sets that session-wide, which also affects any
other Python DataSource in the session)::

    from vector_database_spark.sources import points_jsonl
    points_jsonl.register(spark)
    spark.read.format("points_jsonl").load(path)
    df.write.format("points_jsonl").mode("overwrite").save(path)
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

POINTS_SCHEMA = "id bigint, vector array<float>, payload map<string,string>"


def register(spark) -> None:
    """Register both point data sources on a session. Implementing
    pushFilters makes Spark REQUIRE spark.sql.python.filterPushdown.enabled
    (it refuses to silently skip a declared pushdown), so the flag is set
    here — it is a runtime conf."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PointsJsonlDataSource)
    spark.dataSource.register(PointsFeedDataSource)


@dataclass
class _FilePartition(InputPartition):
    path: str


def _id_bounds(filters):
    """Fold supported id-column filters into a (lo, hi, eq) bound triple;
    return (bounds, unsupported) — unsupported filters stay in the plan
    and Spark re-applies them above the scan (pushdown is an optimization,
    never a semantics change)."""
    lo, hi, eq = None, None, None
    unsupported: list[Filter] = []
    for f in filters:
        col = getattr(f, "attribute", None)
        if col == ("id",):
            if isinstance(f, EqualTo):
                eq = f.value if eq is None else eq
                continue
            if isinstance(f, GreaterThan):
                lo = max(lo, f.value + 1) if lo is not None else f.value + 1
                continue
            if isinstance(f, GreaterThanOrEqual):
                lo = max(lo, f.value) if lo is not None else f.value
                continue
            if isinstance(f, LessThan):
                hi = min(hi, f.value - 1) if hi is not None else f.value - 1
                continue
            if isinstance(f, LessThanOrEqual):
                hi = min(hi, f.value) if hi is not None else f.value
                continue
        unsupported.append(f)
    return (lo, hi, eq), unsupported


class _PointsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("points_jsonl requires a path")
        self.bounds = (None, None, None)

    def pushFilters(self, filters):  # noqa: N802 (API name)
        self.bounds, unsupported = _id_bounds(filters)
        return unsupported

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl")
        )
        # one partition per shard file — parallelism follows the layout
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition):
        if not partition.path:
            return
        lo, hi, eq = self.bounds
        with open(partition.path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                pid = int(rec["id"])
                if eq is not None and pid != eq:
                    continue
                if lo is not None and pid < lo:
                    continue
                if hi is not None and pid > hi:
                    continue
                payload = {str(k): str(v) for k, v in (rec.get("payload") or {}).items()}
                yield (pid, [float(x) for x in rec.get("vector") or []], payload)


@dataclass
class _ShardCommit(WriterCommitMessage):
    path: str


class _PointsWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("points_jsonl requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl.tmp")
        with open(out, "w") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {
                            "id": row["id"],
                            "vector": [float(x) for x in (row["vector"] or [])],
                            "payload": dict(row["payload"] or {}),
                        }
                    )
                    + "\n"
                )
        return _ShardCommit(out)

    def commit(self, messages):
        # task files become visible only on job commit (atomic-rename
        # protocol; a failed job leaves only .tmp files behind). Overwrite
        # semantics: the previous generation's shards are removed in the
        # same commit, so readers never see old+new mixed.
        if self.overwrite:
            new = {m.path[: -len(".tmp")] for m in messages}
            for f in os.listdir(self.path):
                full = os.path.join(self.path, f)
                if f.endswith(".jsonl") and full not in new:
                    os.remove(full)
        for m in messages:
            os.rename(m.path, m.path[: -len(".tmp")])

    def abort(self, messages):
        for m in messages:
            if os.path.exists(m.path):
                os.remove(m.path)


class PointsJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "points_jsonl"

    def schema(self) -> str:
        return POINTS_SCHEMA

    def reader(self, schema):
        return _PointsReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _PointsWriter(self.options, overwrite)


class _PointsFeedReader(SimpleDataSourceStreamReader):
    """Deterministic point-feed stream: each read drains up to
    ``batch_points`` synthetic points from a monotonically increasing id
    sequence capped at ``max_points``. Offsets are plain dicts
    ({"next_id": n}) checkpointed by the engine — replaying any offset
    range regenerates identical rows (ids are the randomness seed), which
    is exactly the exactly-once contract a replayable source must keep."""

    def __init__(self, options):
        self.batch_points = int(options.get("batch_points", "100"))
        self.max_points = int(options.get("max_points", "1000"))
        self.dim = int(options.get("dim", "8"))

    def initialOffset(self):  # noqa: N802 (API name)
        return {"next_id": 0}

    def _rows(self, lo: int, hi: int):
        for pid in range(lo, hi):
            vec = [((pid * 31 + j * 17) % 19) / 10.0 - 0.9 for j in range(self.dim)]
            yield (pid, [float(x) for x in vec], {"label": str(pid % 10)})

    def read(self, start: dict):
        lo = int(start["next_id"])
        hi = min(lo + self.batch_points, self.max_points)
        # iter(list), not a generator: the engine needs an iterator it
        # can also copy.copy() into its prefetch cache — list iterators
        # support both, generators support neither
        return iter(list(self._rows(lo, hi))), {"next_id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path after a restart: must regenerate the same rows
        return iter(list(self._rows(int(start["next_id"]), int(end["next_id"]))))


class PointsFeedDataSource(DataSource):
    """Streaming twin of points_jsonl: `spark.readStream.format
    ("points_feed")` yields Qdrant-shaped point rows from a replayable
    deterministic feed — the Python-DataSource streaming API
    (SimpleDataSourceStreamReader) wired end to end: offset management,
    replay-between-offsets, schema declaration. Drive it into
    foreachBatch upsert for the full streaming-ingest lifecycle
    (vector_db.py:94-106's batched writes, as an unbounded stream)."""

    @classmethod
    def name(cls) -> str:
        return "points_feed"

    def schema(self) -> str:
        return POINTS_SCHEMA

    def simpleStreamReader(self, schema):  # noqa: N802 (API name)
        return _PointsFeedReader(self.options)
