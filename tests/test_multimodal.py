"""Multimodal binary-column plumbing tests: mapInPandas schema/batching is
real; codecs are stubbed (container has no image/audio libs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vector_database_spark.sources import multimodal as mm
from vector_database_spark.sources.tables import read_table


def _pillow_available() -> bool:
    try:
        import PIL  # type: ignore[import-not-found]  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pillow_available(), reason="Pillow installed: real decoder is active"
)
def test_real_decoder_is_stubbed_without_pillow():
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\x89PNG")


@pytest.mark.skipif(not _pillow_available(), reason="Pillow not installed")
def test_real_decoder_with_pillow():
    # 2x3 all-white PNG: decode must report real dimensions and mean 255
    import io

    from PIL import Image  # type: ignore[import-not-found]

    buf = io.BytesIO()
    Image.new("L", (2, 3), color=255).save(buf, format="PNG")
    meta = mm.decode_image_real(buf.getvalue())
    assert meta["fmt"] == "png"
    assert (meta["width"], meta["height"]) == (2, 3)
    assert meta["mean_byte_micro"] == 255_000_000
    assert meta["n_bytes"] == len(buf.getvalue())


def test_extract_image_meta_shapes(spark):
    docs = read_table(spark, SF_SMALL, "documents").limit(20)
    meta = mm.extract_image_meta(mm.binary_from_text(docs))
    rows = meta.collect()
    assert len(rows) == 20
    assert set(meta.columns) == {
        "doc_id", "n_bytes", "fmt", "width", "height", "mean_byte_micro"
    }
    for r in rows:
        assert r["fmt"] in ("png", "jpg")
        assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
        assert r["n_bytes"] > 0


def test_custom_decoder_injection(spark):
    docs = read_table(spark, SF_SMALL, "documents").limit(3)

    def decoder(blob: bytes) -> dict:
        return {
            "n_bytes": len(blob), "fmt": "custom", "width": 1, "height": 1,
            "mean_byte_micro": 0,
        }

    rows = mm.extract_image_meta(mm.binary_from_text(docs), decoder=decoder).collect()
    assert all(r["fmt"] == "custom" for r in rows)


def test_sample_frames_stride(spark):
    docs = read_table(spark, SF_SMALL, "documents").limit(5)
    frames = mm.sample_frames(mm.binary_from_text(docs), every_n_bytes=32)
    per_doc = {
        r["doc_id"]: r["n"] for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    lens = {r["doc_id"]: r["n"] for r in docs.select("doc_id", F.length("text").alias("n")).collect()}
    for did, n_frames in per_doc.items():
        expect = (lens[did] + 31) // 32
        assert n_frames == expect


def test_resize_fake_geometry_known_answer(spark):
    from vector_database_spark.sources import multimodal

    df = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
    out = multimodal.resize_image(
        multimodal.binary_from_text(df), out_w=2, out_h=2
    ).collect()
    # n=8, first=ord('a')=97 -> W=(97%64)+1=34, H=(8%64)+1=9
    # p=0:(r0,c0) idx=0 -> 'a'(97); p=1:(r0,c1) idx=0*34+1*34//2=17 -> clamp 7 'h'
    # p=2:(r1,c0) idx=(1*9//2)*34=136 -> clamp 7; p=3: idx=136+17 -> clamp 7
    assert out[0]["pixels"] == "97 104 104 104"


@pytest.mark.skipif(not _pillow_available(), reason="Pillow not installed")
def test_resize_with_pillow_contract(spark):
    import io

    from PIL import Image  # type: ignore[import-not-found]

    from vector_database_spark.sources import multimodal

    buf = io.BytesIO()
    Image.new("L", (16, 16), color=128).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, blob binary")
    out = multimodal.resize_image(df, out_w=4, out_h=4, use_pillow=True).collect()
    vals = [int(v) for v in out[0]["pixels"].split()]
    assert len(vals) == 16 and all(v == 128 for v in vals)
