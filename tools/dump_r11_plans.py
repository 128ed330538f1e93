#!/usr/bin/env python
"""Dump .explain('formatted') for the r11-touched queries into plans/r11/.

Usage: python tools/dump_r11_plans.py before|after [query ...]
Defaults to the full r11 touch list when no query names are given.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R11_QUERIES = [
    "q_dedup_minhash_auto",
    "q_dedup_minhash",
    "q_incremental_dedup_auto",
    "q_incremental_dedup_indexed",
    "q_incremental_dedup",
    "q_encode_lookup",
    "q_pad_frame",
    "q_decode_lookup",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or R11_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    )
    os.makedirs(out_dir, exist_ok=True)

    from vector_database_spark.queries import QUERIES
    from vector_database_spark.session import get_spark

    spark = get_spark("dump_r11_plans")
    for name in names:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — .explain('formatted') at {sf_dir} ({tag})\n"
                "# NOTE: eager driver-side probe jobs (volume probes, vocab\n"
                "# representation decision, broadcast sizing counts) run at\n"
                "# query-build time and do not appear in this plan; the r11\n"
                "# optimization evidence counts those jobs in\n"
                "# OPTIMIZATION_r11.md.\n\n"
            )
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
