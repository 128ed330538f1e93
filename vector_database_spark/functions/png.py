"""Pure-stdlib PNG codec (struct + zlib) for small 8-bit images.

The reference decodes base64 payload strings into PIL images at query
time (vector_db_query.py:87-89, text_img.py:83-85). This container ships
no Pillow, which previously left the real-decode branches of
sources/multimodal.py untestable (the repo's only pytest skips). A PNG
is just zlib-compressed filtered scanlines, so the stdlib is enough for
the fixture-scale images these paths see:

  * decode: 8-bit greyscale / RGB / grey+alpha / RGBA, non-interlaced,
    all five scanline filters (None/Sub/Up/Average/Paeth).
  * encode: greyscale or RGB, any single filter type per image — the
    filter parameter exists so tests can differentially exercise every
    unfilter branch of the decoder.

Scope is deliberately minimal: bit depths != 8, palettes, and Adam7
interlacing raise ValueError (the codec is a test/fallback path; a real
deployment drops in Pillow, which sources/multimodal.py prefers when
importable).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per pixel by PNG color type (8-bit only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
# decode ceiling: blobs land in executor Python workers via mapInPandas,
# so a crafted header (or a zlib bomb) must not be able to demand an
# unbounded allocation — 64M samples ≈ 64 MB raw, far above any fixture
MAX_SAMPLES = 64 * 1024 * 1024


def is_png(blob: bytes) -> bool:
    return blob[: len(_SIG)] == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a PNG into (width, height, channels, samples).

    ``samples`` is the flat row-major sample list (len = w*h*channels),
    8 bits per sample, alpha included when present.
    """
    if not is_png(blob):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError("truncated PNG IHDR")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if width == 0 or height == 0:
        # zero-dim headers would pass the w*h*ch sample ceiling (product
        # is 0) while (stride+1)*height can still demand ~4 GB — reject
        # before sizing the inflate bound
        raise ValueError(f"PNG with zero dimension ({width}x{height})")
    if width * height * channels > MAX_SAMPLES:
        raise ValueError(
            f"PNG {width}x{height}x{channels} exceeds the stdlib fallback "
            f"codec's {MAX_SAMPLES}-sample ceiling"
        )
    stride = width * channels
    expected = (stride + 1) * height
    # bounded inflate: cap output at the header-derived size so a zlib
    # bomb in IDAT cannot allocate past `expected` (+1 detects overrun)
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError("corrupt PNG IDAT (zlib error)") from exc
    if len(raw) != expected or not (d.eof and not d.unconsumed_tail):
        raise ValueError("PNG data length mismatch")
    out: list[int] = []
    prev = bytes(stride)
    for r in range(height):
        base = r * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev = bytes(line)
        out.extend(line)
    return width, height, channels, out


def to_grey(channels: int, samples: list[int]) -> list[int]:
    """Collapse decoded samples to 8-bit luma, alpha dropped.

    RGB→L uses PIL's exact integer formula
    (L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16) so the stdlib
    fallback and the Pillow branch produce identical bytes.
    """
    if channels == 1:
        return list(samples)
    if channels == 2:  # grey + alpha
        return samples[0::2]
    step = channels  # 3 or 4 (alpha ignored)
    return [
        (samples[i] * 19595 + samples[i + 1] * 38470 + samples[i + 2] * 7471 + 0x8000)
        >> 16
        for i in range(0, len(samples), step)
    ]


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    samples: list[int],
    channels: int = 1,
    filter_type: int = 0,
) -> bytes:
    """Encode 8-bit samples (grey or RGB) as a PNG.

    ``filter_type`` applies that one filter to every scanline — not a
    compression choice here but a decoder-test lever: encoding the same
    image with filters 0..4 must decode back bit-identically.
    """
    if channels not in (1, 3):
        raise ValueError("encode_png supports grey (1) or RGB (3)")
    if len(samples) != width * height * channels:
        raise ValueError("sample count != w*h*channels")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")
    color = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = bytes(
            samples[r * stride + i] & 0xFF for i in range(stride)
        )
        raw.append(filter_type)
        for i in range(stride):
            left = line[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            if filter_type == 0:
                v = line[i]
            elif filter_type == 1:
                v = line[i] - left
            elif filter_type == 2:
                v = line[i] - up
            elif filter_type == 3:
                v = line[i] - ((left + up) >> 1)
            else:
                v = line[i] - _paeth(left, up, ul)
            raw.append(v & 0xFF)
        prev = line
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
