"""Multimodal binary-column plumbing (north-star extension).

The reference stores raw images as base64 payload strings
(vector_db.py:67-72) and decodes them on read (vector_db_query.py:87-88).
Here image/audio/video are opaque BINARY columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` — the Spark-side
plumbing (schema, batching, partition parallelism) is real and tested.
Codecs: the default path uses a deterministic fake decoder (reproducible
oracles without any library); ``decode_image_real`` prefers Pillow when
importable and otherwise decodes PNG through the pure-stdlib codec in
functions/png.py, so the real-decode branch runs (and is tested) even in
this codec-less container. Non-PNG formats without Pillow raise
NotImplementedError — the one remaining environment-bound boundary.

At scale: `spark.read.format("binaryFile")` ingests the raw blobs; blobs
stay columnar Parquet BINARY; metadata extraction is a map-only pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fmt string, width bigint, height bigint, "
    "mean_byte_micro bigint"
)


def decode_image_real(blob: bytes) -> dict:
    """Real image decode (PIL / torchvision path, vector_db.py:55-63).

    Same output contract as ``decode_image_fake`` (n_bytes, fmt, width,
    height, mean_byte_micro), so it is a drop-in ``decoder=`` argument to
    :func:`extract_image_meta`. Prefers Pillow when importable; without
    it (this container), PNG blobs decode through the pure-stdlib codec
    (functions/png.py — to_grey uses PIL's exact RGB→L integers, so both
    branches produce identical bytes) and only non-PNG formats raise
    NotImplementedError. ``tests/test_multimodal.py`` exercises the
    fallback unconditionally — no environment-dependent skips.
    """
    import math

    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        from vector_database_spark.functions import png as _png

        if not _png.is_png(bytes(blob)):
            raise NotImplementedError(
                "no Pillow and blob is not a PNG; use decode_image_fake "
                "or install an image codec"
            ) from None
        w, h, ch, samples = _png.decode_png(bytes(blob))
        data = _png.to_grey(ch, samples)
        mean_micro = (
            math.floor(sum(data) / len(data) * 1_000_000.0 + 0.5) if data else 0
        )
        return {
            "n_bytes": len(blob),
            "fmt": "png",
            "width": w,
            "height": h,
            "mean_byte_micro": mean_micro,
        }

    img = Image.open(io.BytesIO(blob))
    w, h = img.size
    grey = img.convert("L")
    data = list(grey.getdata())
    mean_micro = (
        math.floor(sum(data) / len(data) * 1_000_000.0 + 0.5) if data else 0
    )
    return {
        "n_bytes": len(blob),
        "fmt": (img.format or "unknown").lower(),
        "width": w,
        "height": h,
        "mean_byte_micro": mean_micro,
    }


def decode_image_fake(blob: bytes) -> dict:
    """Deterministic fake decoder: derives metadata purely from the bytes,
    so tests and oracles are reproducible without a codec library."""
    import math

    n = len(blob)
    first = blob[0] if n else 0
    # mean as integer micro-units: floor(x*1e6+0.5) is bit-identical across
    # Python / Spark / DuckDB (see functions/vector.py::micro6)
    mean_micro = math.floor(sum(blob) / n * 1_000_000.0 + 0.5) if n else 0
    return {
        "n_bytes": n,
        "fmt": "png" if first % 2 == 0 else "jpg",
        "width": (first % 64) + 1,
        "height": (n % 64) + 1,
        "mean_byte_micro": mean_micro,
    }


def binary_from_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat the utf-8 bytes of ``text`` as an opaque blob
    column (the container has no real image files)."""
    return docs.withColumn("blob", F.col(text_col).cast("binary"))


def extract_image_meta(
    blobs: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", decoder=None
) -> DataFrame:
    """Decode/metadata pass over binary columns via mapInPandas.

    Arrow-batched: each pandas batch decodes vectorized-per-row inside the
    executor Python worker; no row-at-a-time JVM↔Python chatter.

    The default (fake) decoder is redefined inside the closure so the
    pickled UDF is self-contained — executors need no import of this
    package even when the driver runs from an arbitrary cwd.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def _fake(blob: bytes) -> dict:
            n = len(blob)
            first = blob[0] if n else 0
            return {
                "n_bytes": n,
                "fmt": "png" if first % 2 == 0 else "jpg",
                "width": (first % 64) + 1,
                "height": (n % 64) + 1,
                "mean_byte_micro": math.floor(sum(blob) / n * 1_000_000.0 + 0.5)
                if n
                else 0,
            }

        dec = decoder or _fake
        for pdf in batches:
            metas = [dec(bytes(b)) for b in pdf[blob_col]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "fmt": [m["fmt"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "mean_byte_micro": [m["mean_byte_micro"] for m in metas],
                }
            )
            yield out

    return blobs.select(id_col, blob_col).mapInPandas(_decode, IMAGE_META_SCHEMA)


def sample_frames(
    blobs: DataFrame,
    every_n_bytes: int = 32,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Frame-sampling stub for video-shaped blobs: emit one row per sampled
    'frame' offset (byte stride stands in for frame stride). Demonstrates
    the 1→N mapInPandas expansion shape real frame sampling uses."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, vals = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                bb = bytes(b)
                for off in range(0, len(bb), every_n_bytes):
                    ids.append(int(i))
                    offs.append(off)
                    vals.append(bb[off])
            yield pd.DataFrame({"doc_id": ids, "frame_off": offs, "frame_val": vals})

    return blobs.select(id_col, blob_col).mapInPandas(
        _sample, "doc_id bigint, frame_off bigint, frame_val bigint"
    )


def resize_image(
    blobs: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    use_pillow: bool = False,
) -> DataFrame:
    """Nearest-neighbor image resize over binary columns via mapInPandas —
    the multimodal RESIZE stage (vector_db.py:31-40 preprocesses to a
    fixed geometry before embedding). The blob is interpreted in its
    decoded W×H geometry (decode_image_fake's deterministic dims in this
    container; the Pillow branch decodes and resizes for real with the
    same output contract) and sampled to a fixed ``out_w×out_h`` grid:
    pixel(r,c) = byte[min(floor(r*H/out_h)*W + floor(c*W/out_w), n-1)].

    Output pixels serialize to a space-joined string (driver-side
    canonicalization cannot sort list cells — FIXTURES.md rule). Because
    the fake geometry is pure byte arithmetic, this mapInPandas operator
    carries a FULL DuckDB oracle (ascii/substr twin) — rare for the
    multimodal family and a direct differential test of the Arrow batch
    boundary."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> str:
            n = len(b)
            if n == 0:
                return ""
            if use_pillow:
                # real-decode branch: Pillow when importable, else the
                # pure-stdlib PNG codec with PIL-identical grey + NEAREST
                # ((dst+0.5)*scale, floored) so both produce the same bytes
                try:
                    import io

                    from PIL import Image  # type: ignore[import-not-found]

                    img = Image.open(io.BytesIO(b)).convert("L")
                    small = img.resize((out_w, out_h), Image.NEAREST)
                    return " ".join(str(v) for v in small.getdata())
                except ImportError:
                    from vector_database_spark.functions import png as _png

                    w, h, ch, samples = _png.decode_png(b)
                    grey = _png.to_grey(ch, samples)
                    vals = []
                    for r in range(out_h):
                        sy = min(h - 1, int((r + 0.5) * h / out_h))
                        for c in range(out_w):
                            sx = min(w - 1, int((c + 0.5) * w / out_w))
                            vals.append(grey[sy * w + sx])
                    return " ".join(str(v) for v in vals)
            first = b[0]
            w = (first % 64) + 1
            h = (n % 64) + 1
            vals = []
            for p in range(out_w * out_h):
                r, c = p // out_w, p % out_w
                idx = (r * h // out_h) * w + (c * w // out_w)
                vals.append(b[min(idx, n - 1)])
            return " ".join(str(v) for v in vals)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "pixels": [one(bytes(b)) for b in pdf[blob_col]],
                }
            )

    return blobs.select(id_col, blob_col).mapInPandas(
        _resize, "doc_id bigint, pixels string"
    )


def extract_audio_features(
    blobs: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Audio feature extraction over binary columns via mapInPandas: the
    blob is interpreted as 8-bit unsigned PCM (sample = byte − 128) and
    reduced to the classic waveform features — RMS energy, zero-crossing
    count, peak amplitude. Like resize_image, the fake codec is pure byte
    arithmetic, so the Arrow boundary carries a FULL ascii/substr oracle;
    a real decoder (soundfile/librosa) drops in with the same output
    contract when the container has one."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def one(b: bytes):
            n = len(b)
            if n == 0:
                return 0, 0, 0, 0
            s = [x - 128 for x in b]
            rms = math.sqrt(sum(v * v for v in s) / n)
            zc = sum(1 for i in range(1, n) if (s[i - 1] < 0) != (s[i] < 0))
            return n, math.floor(rms * 1_000_000.0 + 0.5), zc, max(abs(v) for v in s)

        for pdf in batches:
            feats = [one(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_samples": [f[0] for f in feats],
                    "rms_micro": [f[1] for f in feats],
                    "zero_crossings": [f[2] for f in feats],
                    "peak": [f[3] for f in feats],
                }
            )

    return blobs.select(id_col, blob_col).mapInPandas(
        _features,
        "doc_id bigint, n_samples bigint, rms_micro bigint, "
        "zero_crossings bigint, peak bigint",
    )
