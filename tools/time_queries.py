#!/usr/bin/env python
"""Median-of-N noop-sink timings for a subset of registry queries —
the bench.py methodology (same warmup, same sink) restricted to the
queries under the knife, for fast optimize-measure loops.

Usage: python tools/time_queries.py q1,q2,... [runs] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from vector_database_spark.queries import QUERIES
    from vector_database_spark import queries as _qmod
    from vector_database_spark.session import get_spark
    from vector_database_spark.sources.tables import read_table

    print(f"load_at_start={os.getloadavg()[0]:.2f}")
    spark = get_spark("time_queries")
    # bench.py's table-scan warmup
    for t in ("documents", "orders", "lineitem", "events", "customer"):
        read_table(spark, sf_dir, t).write.mode("overwrite").format("noop").save()

    pre_run = {"q_unigram_train": _qmod._UNIGRAM_MEMO.clear}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for name in names:
            ts = []
            for _ in range(runs):
                if name in pre_run:
                    pre_run[name]()
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                ts.append(time.perf_counter() - t0)
            med = statistics.median(ts)
            print(
                f"{med:7.3f}s median  {name}  runs="
                + ",".join(f"{t:.3f}" for t in ts)
            )


if __name__ == "__main__":
    main()
