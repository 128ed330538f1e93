#!/usr/bin/env python
"""Scale-stress probe for exact-substring dedup and the event-analytics
operators (appends to STRESS.md).

1. Substring dedup (operators/dedup.py::substring_dedup) on a wide-vocab
   corpus with PLANTED verbatim copies: every 100th doc repeats the text
   of the doc 50 ids earlier. Every planted copy must be flagged with ALL
   its windows duplicated; zero false positives (wide vocabulary → no
   accidental 10-token window collisions).

2. Funnel / SCD2 / sessionize over hash-synthesized event streams of
   growing size (100k users, ~30-day span) — the per-user shuffle-once
   plans should scale linearly with event count.

Usage: python tools/stress_events.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.operators import dedup, relational  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402
from tools.stress_common import update_section  # noqa: E402

DOC_SIZES = [100_000, 1_000_000]
EVENT_SIZES = [1_000_000, 10_000_000]
VOCAB = 200_000
TOKENS_PER_DOC = 24
SUBSTR_W = 10
PLANT_EVERY = 100   # every 100th doc is a verbatim copy …
PLANT_DELTA = 50    # … of the doc 50 ids earlier


def synth_docs(spark, n_docs: int):
    # planted copies re-derive their body from the SOURCE id → verbatim dup
    src = F.when(
        (F.col("id") % PLANT_EVERY == 0) & (F.col("id") >= PLANT_DELTA),
        F.col("id") - PLANT_DELTA,
    ).otherwise(F.col("id"))
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)),
            lambda j: F.concat(F.lit("t"), F.pmod(F.xxhash64(src, j), F.lit(VOCAB))),
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), body.alias("text")
    )


def synth_events(spark, n_events: int):
    uid = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(100_000))
    # ~30-day span of epoch seconds, deterministic per event
    sec = F.lit(1_704_067_200) + F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(2_592_000))
    etype = F.element_at(
        F.array(*[F.lit(t) for t in ("view", "click", "purchase", "signup", "error")]),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(5)) + 1).cast("int"),
    )
    return spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(sec).alias("ts"),
        uid.alias("user_id"),
        etype.alias("event_type"),
    )


def main() -> None:
    spark = get_spark("stress_events")

    rows_sd = []
    for n in DOC_SIZES:
        docs = synth_docs(spark, n)
        n_planted = sum(
            1 for i in range(0, n, PLANT_EVERY) if i >= PLANT_DELTA
        )
        t0 = time.perf_counter()
        out = dedup.substring_dedup(docs, SUBSTR_W, 909)
        flagged = out.filter(F.col("is_dup"))
        n_flagged = flagged.count()
        dt = time.perf_counter() - t0
        # every flagged doc must be a planted copy with ALL windows duplicated
        bad = flagged.filter(
            (F.col("doc_id") % PLANT_EVERY != 0)
            | (F.col("doc_id") < PLANT_DELTA)
            | (F.col("n_dup_windows") != F.col("n_windows"))
        ).count()
        rows_sd.append((n, n_planted, n_flagged, bad, dt))
        print(rows_sd[-1], flush=True)

    rows_ev = []
    for n in EVENT_SIZES:
        ev = synth_events(spark, n)

        # the probe runs the SHIPPED operators (operators/relational.py),
        # not inline twins — green numbers here mean the code users run
        t0 = time.perf_counter()
        stages = {
            r["stage"]: r["n_users"] for r in relational.funnel_steps(ev).collect()
        }
        t_funnel = time.perf_counter() - t0
        nv, nc, np_ = stages["1_view"], stages["2_click"], stages["3_purchase"]
        monotone = nv >= nc >= np_ > 0

        t0 = time.perf_counter()
        changes = relational.scd2_intervals(ev).count()
        t_scd2 = time.perf_counter() - t0

        t0 = time.perf_counter()
        relational.sessionize(ev).write.mode("overwrite").format("noop").save()
        t_sess = time.perf_counter() - t0
        rows_ev.append((n, t_funnel, monotone, changes, t_scd2, t_sess))
        print(rows_ev[-1], flush=True)

    body = [
        f"Substring dedup ({SUBSTR_W}-token windows, {VOCAB:,}-token",
        f"vocabulary, {TOKENS_PER_DOC} tokens/doc): every 100th doc is a",
        "verbatim copy of an earlier doc. All planted copies flagged with",
        "100% of their windows duplicated; zero false flags (wide vocab —",
        "no accidental window collisions). Two linear shuffles; wall-clock",
        "tracks corpus size, not pair count.",
        "",
        "| docs | planted copies | flagged | false flags | wall s |",
        "|---|---|---|---|---|",
    ]
    for n, planted, flagged, bad, dt in rows_sd:
        ok = "✓" if (flagged == planted and bad == 0) else "✗ MISMATCH"
        body.append(f"| {n:,} | {planted:,} | {flagged:,} {ok} | {bad:,} | {dt:.1f} |")
    body += [
        "",
        "Event analytics over hash-synthesized streams (100k users, 30-day",
        "span). Funnel = three chained filtered min-aggs on user_id; SCD2 =",
        "one window pass on (user_id, ts); sessionize = same key. All",
        "single-shuffle-per-stage, linear in events:",
        "",
        "| events | funnel s | funnel monotone | scd2 state-changes | scd2 s | sessionize s |",
        "|---|---|---|---|---|---|",
    ]
    for n, tf, mono, ch, ts2, ts3 in rows_ev:
        body.append(
            f"| {n:,} | {tf:.1f} | {'✓' if mono else '✗'} | {ch:,} | {ts2:.1f} | {ts3:.1f} |"
        )
    update_section("Substring dedup + event analytics at scale", "\n".join(body))
    print("STRESS.md updated")


if __name__ == "__main__":
    main()
