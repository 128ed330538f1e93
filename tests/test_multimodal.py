"""Multimodal binary-column plumbing tests: mapInPandas schema/batching is
real; image decode runs for real through functions/png.py (stdlib codec)
— Pillow, when present, is preferred with an identical output contract."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vector_database_spark.functions import png
from vector_database_spark.sources import multimodal as mm
from vector_database_spark.sources.tables import read_table


def _pillow_available() -> bool:
    try:
        import PIL  # type: ignore[import-not-found]  # noqa: F401

        return True
    except ImportError:
        return False


def test_png_roundtrip_every_filter_type():
    # a 5x4 grey gradient survives encode->decode under each of the five
    # scanline filters — differential coverage of every unfilter branch
    w, h = 5, 4
    pix = [(r * 37 + c * 91) % 256 for r in range(h) for c in range(w)]
    for ft in range(5):
        blob = png.encode_png(w, h, pix, channels=1, filter_type=ft)
        gw, gh, ch, got = png.decode_png(blob)
        assert (gw, gh, ch) == (w, h, 1), ft
        assert got == pix, f"filter {ft}"


def test_png_rgb_roundtrip_and_grey_formula():
    w, h = 3, 2
    rgb = [v % 256 for v in range(w * h * 3)]
    for ft in (0, 1, 4):
        blob = png.encode_png(w, h, rgb, channels=3, filter_type=ft)
        gw, gh, ch, got = png.decode_png(blob)
        assert (gw, gh, ch) == (w, h, 3) and got == rgb
    grey = png.to_grey(3, rgb)
    # PIL's exact integer RGB->L formula
    want = [
        (rgb[i] * 19595 + rgb[i + 1] * 38470 + rgb[i + 2] * 7471 + 0x8000) >> 16
        for i in range(0, len(rgb), 3)
    ]
    assert grey == want


def test_png_rejects_malformed():
    import struct
    import zlib

    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"\x89PNG")  # truncated signature
    with pytest.raises(ValueError, match="IHDR"):
        png.decode_png(b"\x89PNG\r\n\x1a\n")  # no chunks
    # truncated IHDR payload must be ValueError, not struct.error
    sig = b"\x89PNG\r\n\x1a\n"
    with pytest.raises(ValueError, match="truncated"):
        png.decode_png(sig + struct.pack(">I", 13) + b"IHDR" + b"\x00" * 3)
    # corrupt IDAT must be ValueError, not zlib.error
    good = png.encode_png(2, 2, [1, 2, 3, 4])
    idat_at = good.index(b"IDAT")
    corrupt = good[: idat_at + 4] + b"\xff\xff\xff\xff" + good[idat_at + 8 :]
    with pytest.raises(ValueError, match="zlib|mismatch"):
        png.decode_png(corrupt)


def test_png_bounded_against_bombs():
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # header claims more samples than the codec ceiling → rejected before
    # any inflate
    ihdr = struct.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="ceiling"):
        png.decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))
    # honest small header but an IDAT that inflates far past it → the
    # bounded decompress stops at expected+1 and reports a mismatch
    # instead of materializing the bomb
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (50 * 1024 * 1024), 9)  # 50 MB of zeros
    with pytest.raises(ValueError, match="mismatch"):
        png.decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    # width=0 bypasses the w*h*ch sample ceiling (product 0) while
    # (stride+1)*height can still be ~4 GB — must be rejected outright
    for w, h in ((0, (1 << 32) - 1), ((1 << 32) - 1, 0), (0, 0)):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        with pytest.raises(ValueError, match="zero dimension"):
            png.decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))


def test_real_decoder_decodes_png_without_pillow():
    # 2x3 all-white PNG via the stdlib encoder: decode must report real
    # dimensions and mean 255 whether Pillow is present or not
    blob = png.encode_png(2, 3, [255] * 6)
    meta = mm.decode_image_real(blob)
    assert meta["fmt"] == "png"
    assert (meta["width"], meta["height"]) == (2, 3)
    assert meta["mean_byte_micro"] == 255_000_000
    assert meta["n_bytes"] == len(blob)


def test_real_decoder_base64_payload_semantics():
    # the reference stores images as base64 payload strings and decodes on
    # read (vector_db_query.py:87-88): same lifecycle here
    grad = [(i * 17) % 256 for i in range(4 * 4)]
    payload = base64.b64encode(png.encode_png(4, 4, grad)).decode("ascii")
    meta = mm.decode_image_real(base64.b64decode(payload))
    assert (meta["width"], meta["height"]) == (4, 4)
    import math

    assert meta["mean_byte_micro"] == math.floor(
        sum(grad) / len(grad) * 1_000_000.0 + 0.5
    )


def test_real_decoder_non_png_without_pillow():
    if _pillow_available():
        pytest.skip("Pillow installed: non-PNG formats decode for real")
    with pytest.raises(NotImplementedError, match="not a PNG"):
        mm.decode_image_real(b"\xff\xd8\xff\xe0JFIF-ish")


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


def test_resize_real_decode_contract(spark):
    # runs through Pillow when importable, else the stdlib PNG fallback —
    # both must hit the same contract
    from vector_database_spark.sources import multimodal

    blob = png.encode_png(16, 16, [128] * 256)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, blob binary"
    )
    out = multimodal.resize_image(df, out_w=4, out_h=4, use_pillow=True).collect()
    vals = [int(v) for v in out[0]["pixels"].split()]
    assert len(vals) == 16 and all(v == 128 for v in vals)


def test_resize_real_decode_nearest_geometry(spark):
    # 4x2 image with distinct quadrant values downsampled 2x2: NEAREST at
    # (dst+0.5)*scale must pick the center-right pixel of each quadrant
    from vector_database_spark.sources import multimodal

    pix = [10, 10, 20, 20,
           30, 30, 40, 40]
    blob = png.encode_png(4, 2, pix)
    df = spark.createDataFrame(
        [(7, bytearray(blob))], "doc_id long, blob binary"
    )
    out = multimodal.resize_image(df, out_w=2, out_h=2, use_pillow=True).collect()
    # sx = int((c+0.5)*4/2) -> 1, 3 ; sy = int((r+0.5)*2/2) -> 0, 1
    assert out[0]["pixels"] == "10 20 30 40"
