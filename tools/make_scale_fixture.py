#!/usr/bin/env python
"""Synthesize an sf1.0-scale fixture from /root/testdata/sf0.1 for the
registry-wide scaling sweep (r9 directive 5). The driver ships
sf{0.001,0.01,0.1} only; this replicates sf0.1 10x with KEY-CONSISTENT
id shifts so every join keeps its fan-out:

- fact+dim keys shift together per replica r (orderkey/custkey/partkey/
  suppkey/event/user/doc/vec ids each get r * <stride>), so orders join
  exactly one customer replica, lineitem its own orders, etc.
- replica 0 is the VERBATIM sf0.1 data — every literal a bench query
  pins (specific ids, date ranges) still resolves.
- document text is letter-permuted per replica (translate() over
  'a..j' with 10 distinct permutations): token structure, lengths and
  whitespace survive (text-stats queries scale honestly) while
  cross-replica token overlap collapses — otherwise every doc would
  have 9 exact clones and the near-dup operators would measure the
  clone explosion instead of scaling.
- embeddings get deterministic SIGN FLIPS on a quarter of their
  components per replica (xxhash-gated): norms and per-dim
  distributions survive, cross-replica cosine drops far below every
  near-dup threshold.

Output: /tmp/sf1.0/*.parquet (a scratch artifact, not repo data).
Usage: python tools/make_scale_fixture.py [replicas] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_database_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

# id strides: far above any sf0.1 key range
S_ORDER = 10_000_000
S_CUST = 1_000_000
S_PART = 1_000_000
S_SUPP = 100_000
S_EVENT = 10_000_000
S_USER = 1_000_000
S_DOC = 1_000_000
S_VEC = 1_000_000

# 10 permutations of 'abcdefghij' (replica 0 = identity)
PERMS = [
    "abcdefghij",
    "bcdefghija",
    "cdefghijab",
    "defghijabc",
    "efghijabcd",
    "jihgfedcba",
    "ihgfedcbaj",
    "hgfedcbaji",
    "gfedcbajih",
    "fedcbajihg",
]


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    spark = get_spark("make_scale_fixture")
    os.makedirs(out, exist_ok=True)

    def rep(table, build):
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = [build(src, r) for r in range(replicas)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: {df.count():,} rows")

    # dims referenced by nationkey only — tiny, keep verbatim
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")

    rep(
        "customer",
        lambda d, r: d.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(r * S_CUST)
        ),
    )
    rep(
        "supplier",
        lambda d, r: d.withColumn(
            "s_suppkey", F.col("s_suppkey") + F.lit(r * S_SUPP)
        ),
    )
    rep(
        "part",
        lambda d, r: d.withColumn(
            "p_partkey", F.col("p_partkey") + F.lit(r * S_PART)
        ),
    )
    rep(
        "orders",
        lambda d, r: d.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(r * S_ORDER)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(r * S_CUST)),
    )
    rep(
        "lineitem",
        lambda d, r: (
            d.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * S_ORDER))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(r * S_PART))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(r * S_SUPP))
        ),
    )
    rep(
        "events",
        lambda d, r: d.withColumn(
            "event_id", F.col("event_id") + F.lit(r * S_EVENT)
        ).withColumn("user_id", F.col("user_id") + F.lit(r * S_USER)),
    )
    rep(
        "documents",
        lambda d, r: (
            d.withColumn("doc_id", F.col("doc_id") + F.lit(r * S_DOC))
            .withColumn("text", F.translate(F.col("text"), PERMS[0], PERMS[r % len(PERMS)]))
        ),
    )

    def flip_embedding(d, r):
        if r == 0:
            return d
        flipped = F.zip_with(
            F.col("embedding"),
            F.sequence(F.lit(0), F.size("embedding") - 1),
            lambda x, j: F.when(
                F.pmod(F.xxhash64(F.col("vec_id"), j, F.lit(r)), F.lit(4)) == 0,
                -x,
            ).otherwise(x),
        )
        return d.withColumn("embedding", flipped.cast("array<float>"))

    rep(
        "embeddings",
        lambda d, r: flip_embedding(
            d.withColumn("vec_id", F.col("vec_id") + F.lit(r * S_VEC)), r
        ),
    )
    print(f"scale fixture written to {out}")


if __name__ == "__main__":
    main()
