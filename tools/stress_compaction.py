#!/usr/bin/env python
"""Read cost vs write-batch count, and the auto-compaction payoff
(updates the STRESS.md "Log read amplification & auto-compaction"
section — r8 directive 6).

The log-structured collection resolves every read through a latest-wins
window over ALL version batches plus a tombstone anti-join, so read cost
grows with the RAW log even when the live set is constant. This probe
measures an exact search's wall clock on a 1M-live-point collection as
update batches accumulate (auto_compact OFF), then repeats the lifecycle
with the default policy ON and records where the fold fires and what the
read costs after it.

Usage: python tools/stress_compaction.py [n_points] [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark import catalog as cat_mod  # noqa: E402
from vector_database_spark.catalog import Catalog  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402
from tools.stress_common import update_section  # noqa: E402

DIM = 32
K = 5
BATCH = 250_000  # rows per update batch (same ids — pure amplification)


def synth_points(spark, lo, hi, bump: float = 0.0):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(1009)).cast("double")
                / 504.0
                - 1.0
                + F.lit(bump)
            )
            + F.when(j == 0, 2.0).otherwise(0.0),
        ).alias("embedding"),
        F.create_map(F.lit("g"), (F.col("id") % 7).cast("string")).alias(
            "payload"
        ),
    )


def read_cost(col, qv):
    t0 = time.perf_counter()
    col.search(qv, limit=K).collect()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("stress_compaction")
    root = tempfile.mkdtemp(prefix="vdbs_compact_")
    qv = None
    try:
        # ---- phase 1: policy OFF — raw read-amplification curve --------
        cat = Catalog(spark, root)
        col = cat.create_collection("off", dim=DIM, auto_compact=False)
        col.upsert(synth_points(spark, 0, n))
        qv = [
            float(x)
            for x in synth_points(spark, 3, 4).collect()[0]["embedding"]
        ]
        read_cost(col, qv)  # warm the scan/codegen path off the curve
        curve = [(1, read_cost(col, qv))]
        for b in range(1, n_batches + 1):
            col.upsert(synth_points(spark, 0, BATCH, bump=0.01 * b))
            if b % 3 == 0:
                curve.append((1 + b, read_cost(col, qv)))
        t0 = time.perf_counter()
        col.compact()
        t_compact = time.perf_counter() - t0
        post = read_cost(col, qv)

        # ---- phase 2: policy ON (default), low threshold to fit the
        # probe budget — the POLICY is what's being measured, the
        # MIN_BATCHES constant is exercised by unit tests -----------------
        cat_mod.AUTO_COMPACT_MIN_BATCHES = 8
        col2 = cat.create_collection("on", dim=DIM)
        col2.upsert(synth_points(spark, 0, n))
        fired_at = None
        on_curve = []
        for b in range(1, n_batches + 1):
            col2.upsert(synth_points(spark, 0, BATCH, bump=0.01 * b))
            info = cat._load()["on"]
            if fired_at is None and info.get("compacted_at"):
                fired_at = b
                on_curve.append((1 + b, read_cost(col2, qv)))
        assert fired_at, "auto-compaction never fired in phase 2"
        final_on = read_cost(col2, qv)
        raw_rows = col2._approx_live_rows()

        # ---- phase 3 (r9 directive 2): pinned snapshot — the policy
        # folds PARTIALLY up to the pin instead of suspending, so an
        # always-snapshotted collection's amplification below the pin is
        # reclaimed while the restore point stays valid ------------------
        col3 = cat.create_collection("pinned", dim=DIM)
        col3.upsert(synth_points(spark, 0, n))
        for b in range(1, 4):  # churn BELOW the future pin
            col3.upsert(synth_points(spark, 0, BATCH, bump=0.01 * b))
        col3.create_snapshot("pin")
        pin_v = cat._load()["pinned"]["snapshots"]["pin"]
        pre_pin_cost = read_cost(col3, qv)
        fired3 = None
        for b in range(4, n_batches + 1):
            col3.upsert(synth_points(spark, 0, BATCH, bump=0.01 * b))
            info3 = cat._load()["pinned"]
            if fired3 is None and info3.get("compacted_at"):
                fired3 = b
        assert fired3, "partial fold never fired with a pinned snapshot"
        post_pin_cost = read_cost(col3, qv)
        info3 = cat._load()["pinned"]
        assert info3["compacted_at"] == pin_v, (
            "partial fold must stamp exactly the pin"
        )
        # the pinned state is still fully restorable after the fold
        assert col3.df(as_of_version=pin_v).count() == n
        raw3 = col3._approx_live_rows()

        lines = [
            f"1M live points (32-d), {BATCH:,}-row UPDATE batches of existing",
            "ids (pure amplification — live set constant). Exact-search wall",
            "clock as the version log grows, auto_compact OFF:",
            "",
            "| version batches | exact search s |",
            "|---|---|",
        ]
        for v, s in curve:
            lines.append(f"| {v} | {s:.2f} |")
        lines += [
            "",
            f"- manual compact() after {n_batches + 1} batches: "
            f"{t_compact:.1f}s fold; search back to **{post:.2f}s**",
            f"- policy ON (threshold 8 for the probe): fold fired on write "
            f"batch {fired_at}, search immediately after: "
            f"{on_curve[0][1]:.2f}s; at end of run: {final_on:.2f}s with "
            f"the raw log held at {raw_rows:,} rows",
            f"- pinned snapshot (r9): with a snapshot pinned after 3 churn "
            f"batches, the policy now folds PARTIALLY up to the pin "
            f"(fired on batch {fired3}, compacted_at == the pin); the "
            f"750k dead rows below the pin were reclaimed (raw log "
            f"{raw3:,} rows = live + pin-to-head batches only), search "
            f"{pre_pin_cost:.2f}s at the pin -> {post_pin_cost:.2f}s at "
            f"end of run, and the snapshot restores intact. Amplification "
            f"is thus bounded by (1 + batches since the OLDEST pin) "
            f"instead of unbounded.",
            "",
            "Read cost tracks RAW log rows (window + anti-join over every",
            "batch), so unbounded update/delete churn degrades reads without",
            "bound until a fold — the policy caps amplification at ~2x live",
            "(AUTO_COMPACT_MIN_AMPLIFICATION) once AUTO_COMPACT_MIN_BATCHES",
            "versions accumulate, paying one live count() per evaluation",
            "window. Append-only collections never trigger it (raw == live,",
            "a rewrite reclaims nothing). Trade recorded at the trigger:",
            "compaction forfeits time travel/snapshots older than the fold —",
            "collections with live snapshots fold only BELOW their oldest",
            "pin (r9 partial folds; a pin AT the last fold suspends), and",
            "refresh_{lsh,ivf}_index across a fold refuses (the tombstones",
            "it needs are gone) and demands a rebuild.",
        ]
        update_section(
            "Log read amplification & auto-compaction (r8)", "\n".join(lines)
        )
        print("STRESS.md updated")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
