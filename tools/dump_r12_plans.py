#!/usr/bin/env python
"""Dump .explain('formatted') for the r12-touched queries into plans/r12/.

Usage: python tools/dump_r12_plans.py before|after [query ...]
Defaults to the full r12 touch list when no query names are given.
Run `before` from the pre-round tree (git archive d198376) and `after`
from HEAD — the dumps are the judge's evidence for every plan claim in
OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R12_QUERIES = [
    "q_line_dedup",
    "q_dedup_minhash_auto",
    "q_incremental_dedup",
    "q_incremental_dedup_indexed",
    "q_incremental_dedup_auto",
    "q_encode_lookup",
    # lambda-body / per-HOF re-tokenize pins (OPTIMIZATION_r12.md
    # discovery A)
    "q_quality_score",
    "q_gopher_rules",
    "q_lang_id",
    "q_dsir_select",
    "q_repetition_ratio",
    "q_loss_mask",
    "q_ngram_jaccard",
    "q_topngram_fraction",
    "q_pipeline_e2e",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or R12_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(out_dir, exist_ok=True)

    from vector_database_spark.queries import QUERIES
    from vector_database_spark.session import get_spark

    spark = get_spark("dump_r12_plans")
    for name in names:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({buf.getvalue().count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
