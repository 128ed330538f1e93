#!/usr/bin/env python
"""NSW + IVFPQ incremental refresh vs full rebuild at 1M points
(updates the STRESS.md "NSW + IVFPQ incremental refresh at 1M points"
section — r9 directives 1 and 7, landed r10: with these two families
refreshing, no index is rebuild-only anymore).

Lifecycle: 1M-point collection -> build NSW (auto buckets) + IVFPQ
(sqrt-N auto cells) -> one write batch of 50k new + 50k updates + 10k
deletes -> refresh_<kind>_index vs build_<kind>_index wall clock side
by side; NSW recall@5 (vs exact) through the refreshed multi-segment
graph vs the consolidated rebuild (the r9 'within 2 points' gate);
IVFPQ codebook-drift escalation on a shifted batch (ADC recon-error
ratio -> optimize() 'rebuilt_drift' -> recall recovered).

Usage: python tools/stress_refresh_graph_pq.py [n_points] [delta]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.catalog import Catalog  # noqa: E402
from vector_database_spark.session import get_spark  # noqa: E402
from tools.stress_common import update_section  # noqa: E402

DIM = 32
K = 5
N_QUERIES = 20


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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    delta = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("stress_refresh_graph_pq")
    root = tempfile.mkdtemp(prefix="vdbs_refresh2_")
    lines = []
    try:
        cat = Catalog(spark, root)
        col = cat.create_collection("c", dim=DIM, auto_compact=False)
        t0 = time.perf_counter()
        col.upsert(synth_points(spark, 0, n))
        lines.append(f"- ingest {n:,} points: {time.perf_counter()-t0:.1f}s")

        t0 = time.perf_counter()
        col.build_nsw_index()
        t_nsw_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        col.build_ivfpq_index()
        t_pq_build = time.perf_counter() - t0

        half = delta // 2
        col.upsert(
            synth_points(spark, n, n + half).unionByName(
                synth_points(spark, 0, half, bump=0.5)
            )
        )
        col.delete(point_ids=list(range(n - 10_000, n)))

        t0 = time.perf_counter()
        appended_nsw = col.refresh_nsw_index()
        t_nsw_refresh = time.perf_counter() - t0
        t0 = time.perf_counter()
        appended_pq = col.refresh_ivfpq_index()
        t_pq_refresh = time.perf_counter() - t0

        # semantics through the refreshed indexes
        qv = [
            float(x)
            for x in col.df()
            .filter(F.col("id") == 3)
            .collect()[0]["embedding"]
        ]
        top = [r["id"] for r in col.search_nsw(qv, limit=1).collect()]
        assert top == [3], f"updated id not served by refreshed NSW: {top}"
        top_pq = [r["id"] for r in col.search_ivfpq(qv, limit=1).collect()]
        assert top_pq == [3], f"updated id not served by refreshed IVFPQ: {top_pq}"

        # NSW recall@5 vs exact — refreshed multi-segment graph first
        queries = [
            (i, [float(x) for x in r["embedding"]])
            for i, r in enumerate(
                synth_points(spark, 137, 137 + N_QUERIES).collect()
            )
        ]
        exact = {}
        for qid, q in queries:
            exact[qid] = {x["id"] for x in col.search(q, limit=K).collect()}

        def nsw_recall():
            got = {}
            from vector_database_spark.operators import ann

            res = ann.nsw_search_layout(
                col._nsw_layout_df(), queries, k=K, id_col="id", emb_col="embedding"
            ).collect()
            for r in res:
                got.setdefault(r["qid"], set()).add(r["id"])
            hits = sum(len(exact[q] & got.get(q, set())) for q, _ in queries)
            return hits / (K * len(queries))

        rec_refreshed = nsw_recall()

        # rebuild on the SAME state for the honest cost + recall contrast
        t0 = time.perf_counter()
        col.build_nsw_index()
        t_nsw_rebuild = time.perf_counter() - t0
        rec_rebuilt = nsw_recall()
        t0 = time.perf_counter()
        col.build_ivfpq_index()
        t_pq_rebuild = time.perf_counter() - t0

        # --- IVFPQ codebook drift -> optimize() escalation ---------------
        shift_lo = n + half
        col.upsert(synth_points(spark, shift_lo, shift_lo + delta, bump=3.0))
        t0 = time.perf_counter()
        col.refresh_ivfpq_index()
        t_drift_refresh = time.perf_counter() - t0
        drift_ratio = col.index_status()["ivfpq"]["drift_ratio"]

        # Codebook quality is measured DIRECTLY here: the mean ADC
        # reconstruction error of the SHIFTED rows under the pinned vs
        # the retrained codebooks (the statistic the escalation manages).
        # k-NN recall@5 cannot see codebook quality on this synthetic at
        # 1M: all 100k shifted rows quantize to a handful of shared codes
        # (the cluster is tighter than any 16-way subspace codebook can
        # subdivide), so the shortlist is pure id-asc tie-break at ANY
        # width — the recall-recovery contract is pinned instead in
        # tests/test_catalog.py::test_ivfpq_refresh_incremental_and_
        # codebook_drift at a resolution where k-NN is meaningful.
        import json as _json
        import os as _os

        import numpy as _np

        from vector_database_spark.operators import ann as _ann

        shifted = col.df().filter(F.col("id") >= shift_lo).select(
            "id", "embedding"
        )

        def shifted_recon_err():
            meta_path = _os.path.join(
                col._ivfpq_index_path, "_index_meta.json"
            )
            with open(meta_path) as fh:
                meta = _json.load(fh)
            books = _np.asarray(meta["codebooks"], dtype=_np.float64)
            row = (
                _ann.pq_encode(
                    shifted,
                    books,
                    id_col="id",
                    emb_col="embedding",
                    payload_cols=(),
                    with_recon_err=True,
                )
                .agg(F.avg("__recon_err").alias("d"))
                .first()
            )
            return float(row["d"]), float(meta["build_mean_assign_dist"])

        err_pinned, base_pinned = shifted_recon_err()
        t0 = time.perf_counter()
        report = col.optimize()
        t_optimize = time.perf_counter() - t0
        assert report["ivfpq"] == "rebuilt_drift", report
        err_retrained, base_retrained = shifted_recon_err()

        lines += [
            f"- build_nsw_index (auto buckets): {t_nsw_build:.1f}s; "
            f"build_ivfpq_index (sqrt-N auto cells): {t_pq_build:.1f}s",
            f"- write batch: {half:,} new + {half:,} updated + 10,000 deleted",
            f"- refresh_nsw_index: **{t_nsw_refresh:.1f}s** "
            f"({appended_nsw:,} delta-segment graph rows) vs rebuild "
            f"{t_nsw_rebuild:.1f}s — "
            f"**{t_nsw_rebuild / max(t_nsw_refresh, 1e-9):.1f}x**",
            f"- refresh_ivfpq_index: **{t_pq_refresh:.1f}s** "
            f"({appended_pq:,} rows, pinned centroids + codebooks) vs "
            f"rebuild {t_pq_rebuild:.1f}s — "
            f"**{t_pq_rebuild / max(t_pq_refresh, 1e-9):.1f}x**",
            f"- NSW recall@5 vs exact over {N_QUERIES} queries: "
            f"**{rec_refreshed:.3f}** through the refreshed multi-segment "
            f"graph vs {rec_rebuilt:.3f} after consolidation "
            f"(gap {abs(rec_rebuilt - rec_refreshed):.3f} — the r9 'within "
            f"2 points' gate)",
            "- asserted through BOTH refreshed indexes: an updated id is",
            "  served its NEW vector (its base rows are masked, its delta",
            "  segment row wins); deletes masked out",
            f"- IVFPQ codebook-drift escalation: a {delta:,}-row SHIFTED "
            f"batch refreshed in {t_drift_refresh:.1f}s with ADC recon-error "
            f"ratio **{drift_ratio:.1f}** (threshold 1.5); optimize() "
            f"escalated refresh->rebuild ('rebuilt_drift', {t_optimize:.1f}s "
            f"total). Codebook quality measured directly: mean recon error "
            f"of the shifted rows {err_pinned:.3f} under the PINNED books "
            f"({err_pinned/max(base_pinned,1e-12):.1f}x their build mean) -> "
            f"**{err_retrained:.3f}** under the retrained books "
            f"({err_retrained/max(base_retrained,1e-12):.1f}x the new build "
            f"mean) — the retrain gives the shifted region its own "
            f"codewords. (k-NN recall@5 cannot see codebook quality on "
            f"this synthetic: the 100k shifted rows are tighter than any "
            f"16-way subspace codebook subdivides, so every shortlist is "
            f"id-asc tie-break; the recall-recovery contract is pinned in "
            f"tests/test_catalog.py at a resolution where k-NN is "
            f"meaningful.) index_status()['ivfpq']['drift_ratio'] is the "
            f"monitoring hook",
            "",
            "NSW refresh cost scales with the DELTA (a small graph build over",
            "the write batch + mask append); the rebuild re-inserts all N",
            "rows into fresh graphs — the most expensive build of any family",
            "(vectorized r9, still ~N log N inserts). The multi-segment beam",
            "pays a bounded recall tax (small segments have short beams,",
            "masked base nodes leave routing holes), so optimize()",
            "consolidates past NSW_DELTA_REBUILD_FRACTION (0.5) of the base",
            "rows — the graph analogue of the IVF drift escalation. IVFPQ",
            "refresh reuses pinned centroids AND codebooks; its staleness",
            "mode is quantization quality, which the recon-error ratio now",
            "measures per segment exactly like IVF's assignment drift.",
        ]
        update_section(
            "NSW + IVFPQ incremental refresh at 1M points (r10)",
            "\n".join(lines),
        )
        print("STRESS.md updated")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
