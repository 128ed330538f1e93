"""Physical-layout tests for relational operators: the Z-order clustering
claim is verified against real parquet footer stats, not assumptions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _file_ranges(path: str, cols: tuple[str, str]):
    """Per-file (min, max) of two columns read from the parquet footers —
    exactly the stats a scan's file-level skipping consults."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def test_zorder_layout_skips_on_non_leading_dim(spark, tmp_path):
    from vector_database_spark.operators import relational
    from vector_database_spark.sources.tables import read_table

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id",
        F.pmod(F.col("user_id"), 1024).cast("long").alias("ux"),
        F.pmod(F.floor(F.col("ts").cast("long") / 3600), 1024)
        .cast("long")
        .alias("tx"),
    )

    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    relational.zorder_write(ev, zpath, "ux", "tx", n_files=8)
    # linear layout: clustered on ux only (the 1-d sort a naive pipeline
    # would use)
    (
        ev.repartitionByRange(8, "ux")
        .sortWithinPartitions("ux")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zr = _file_ranges(zpath, ("ux", "tx"))
    lr = _file_ranges(lpath, ("ux", "tx"))
    assert len(zr) == len(lr) == 8

    # box predicate on tx ALONE (the non-leading dimension): every linear
    # file spans ~the full tx range, so none can be skipped; z-ordered
    # files cover compact Z-curve segments and most fall outside the box
    tmin = min(r["tx"][0] for r in lr)
    tmax = max(r["tx"][1] for r in lr)
    lo = tmin + (tmax - tmin) // 2
    hi = lo + max(1, (tmax - tmin) // 8)

    def hits(ranges):
        return sum(1 for r in ranges if not (r["tx"][1] < lo or r["tx"][0] > hi))

    z_hits, l_hits = hits(zr), hits(lr)
    assert l_hits == 8, f"linear layout should span tx everywhere, hit {l_hits}"
    assert z_hits < l_hits, (z_hits, l_hits)

    # and the data survives the re-layout intact
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zorder_key_roundtrip_property(spark):
    # Morton interleave is a bijection on (a, b) within the bit budget:
    # de-interleaving the key recovers both inputs exactly
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vector_database_spark.operators import relational

    pairs = [(0, 0), (1023, 1023), (1, 2), (512, 511)]
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select(
        "a", "b", relational.zorder_key(F.col("a"), F.col("b"), 10).alias("z")
    ).collect()

    def deinterleave(z):
        a = b = 0
        for j in range(10):
            a |= ((z >> (2 * j)) & 1) << j
            b |= ((z >> (2 * j + 1)) & 1) << j
        return a, b

    for r in rows:
        assert deinterleave(r["z"]) == (r["a"], r["b"])

    # pure-python twin of the column expression, property-checked broadly
    def zkey_py(a, b):
        k = 0
        for j in range(10):
            k += ((a >> j) & 1) << (2 * j)
            k += ((b >> j) & 1) << (2 * j + 1)
        return k

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 1023), st.integers(0, 1023))
    def check(a, b):
        assert deinterleave(zkey_py(a, b)) == (a, b)

    check()
