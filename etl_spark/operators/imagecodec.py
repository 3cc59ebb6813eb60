"""Real image codec — pure-stdlib PNG encode/decode + JPEG header parse.

This replaces the round-2 `NotImplementedError` codec slot with an
honest decoder the sandbox can actually run:

- PNG: full round-trip. `encode_png` writes a spec-valid grayscale
  8-bit PNG (signature, IHDR, zlib-compressed filter-0 scanlines in
  IDAT, CRC-correct chunks, IEND) that any external PNG reader can
  open. `decode_image` parses IHDR for dimensions AND decompresses
  IDAT, strips the per-row filter bytes, and returns the real pixel
  sum — so a correctness oracle on the pixel values proves the bytes
  were genuinely decoded, not pattern-matched.
- JPEG: structural header. `encode_jpeg_header` writes SOI + APP0/JFIF
  + SOF0 + EOI (no entropy-coded scan — building a baseline Huffman
  coder is out of scope); `decode_image` walks the marker segments to
  the SOF frame header and extracts height/width/precision/components,
  exactly the header-sniff fast path real pipelines use for dimension
  extraction (PIL's lazy `Image.open(...).size` reads the same bytes).

Everything here is a pure function of `bytes` — deterministic, no I/O,
no third-party libs — so it is safe inside Arrow-batched `mapInPandas`
workers (operators/multimodal.py) and trivially oracle-checkable.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# SOF markers that carry frame dimensions (baseline, progressive, ...).
# C4 (DHT), C8 (JPG ext), CC (DAC) are NOT frame headers.
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, seed: int) -> bytes:
    """Spec-valid grayscale 8-bit PNG whose pixel i (row-major) is
    `(seed + i) % 256` — deterministic, so an oracle can recompute the
    pixel sum without touching the bytes."""
    if width < 1 or height < 1:
        raise ValueError("png dimensions must be >= 1")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    rows = []
    i = 0
    for _y in range(height):
        rows.append(b"\x00")  # filter type 0 (None) per scanline
        rows.append(bytes((seed + i + x) % 256 for x in range(width)))
        i += width
    idat = zlib.compress(b"".join(rows), 6)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def encode_jpeg_header(width: int, height: int, channels: int = 1) -> bytes:
    """Structurally valid JPEG through the frame header: SOI, APP0/JFIF,
    SOF0 (baseline, 8-bit precision), EOI. Carries real dimensions; no
    entropy-coded scan data."""
    if width < 1 or height < 1 or not (1 <= width <= 65535 and 1 <= height <= 65535):
        raise ValueError("jpeg dimensions must be in [1, 65535]")
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof_comps = b"".join(
        bytes([cid + 1, 0x11, 0]) for cid in range(channels)
    )
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels]) + sof_comps
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        + b"\xff\xd9"
    )


def _decode_png(payload: bytes) -> dict:
    pos = len(PNG_SIG)
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", data[:10]
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None:
        raise ValueError("png: missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    px_sum = None
    if idat and bit_depth == 8 and color_type == 0:
        raw = zlib.decompress(bytes(idat))
        stride = width + 1  # 1 filter byte per scanline
        total = 0
        for y in range(height):
            row = raw[y * stride : (y + 1) * stride]
            if row[0] != 0:
                raise ValueError(f"png: unsupported filter type {row[0]}")
            total += sum(row[1:])
        px_sum = total
    return {
        "format": "png",
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "channels": channels,
        "px_sum": px_sum,
    }


def _decode_jpeg(payload: bytes) -> dict:
    pos = 2  # past SOI
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: desynchronized marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            seg = payload[pos + 4 : pos + 2 + seg_len]
            precision = seg[0]
            height, width = struct.unpack(">HH", seg[1:5])
            channels = seg[5]
            return {
                "format": "jpeg",
                "width": width,
                "height": height,
                "bit_depth": precision,
                "channels": channels,
                "px_sum": None,  # no scan data decode (header-only path)
            }
        pos += 2 + seg_len
    raise ValueError("jpeg: no SOF frame header found")


def decode_image(payload: bytes) -> dict:
    """Sniff + decode an image payload. PNG → full decode including the
    real pixel sum (zlib inflate + unfilter); JPEG → frame-header parse
    (width/height/precision/components). Raises ValueError on anything
    else — callers route non-image kinds elsewhere."""
    if payload is None:
        raise ValueError("null payload")
    b = bytes(payload)
    if b.startswith(PNG_SIG):
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        return _decode_jpeg(b)
    raise ValueError("unrecognized image format (not PNG or JPEG)")


def decode_png_pixels(payload: bytes) -> bytes:
    """Raw grayscale pixel bytes of an 8-bit filter-0 PNG — the same
    chunk walk + zlib inflate + unfilter as `decode_image`, but
    returning the pixel plane itself (row-major, width*height bytes)
    for feature extraction (e.g. intensity histograms). Raises
    ValueError for non-PNG payloads or unsupported color/filter modes
    — callers route other formats to their own decoders."""
    if payload is None:
        raise ValueError("null payload")
    b = bytes(payload)
    if not b.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIG)
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("png: missing IHDR")
    if bit_depth != 8 or color_type != 0:
        raise ValueError("png: pixel decode supports 8-bit grayscale only")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1  # 1 filter byte per scanline
    out = bytearray()
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise ValueError(f"png: unsupported filter type {row[0]}")
        out += row[1:]
    return bytes(out)
