"""Real audio codec — pure-stdlib WAV (RIFF/PCM) encode/decode.

Companion to operators/imagecodec.py: the round-2 multimodal story
kept audio behind the deterministic fake because "the libs this
container lacks" — but a WAV container needs no libs at all. This
module closes that gap the same way the PNG codec did for images:

- `encode_wav` writes a spec-valid RIFF/WAVE file (fmt chunk: PCM,
  mono, 16-bit little-endian; data chunk with real samples) that any
  external reader — including Python's own stdlib `wave` module, which
  the tests use as an independent validator — can open.
- `decode_wav` walks the RIFF chunk list generically (tolerating extra
  chunks and odd-length padding per spec), parses the fmt chunk, and
  SUMS THE DECODED SAMPLES — so a correctness oracle on the sample sum
  proves the PCM payload was genuinely decoded, not header-sniffed.

Sample values are a pure function of (seed, i) — `((seed + 37*i) %
65536) - 32768` — so a SQL oracle can recompute the sum without
touching the bytes (same discipline as encode_png's pixel ramp).

Everything is a pure function of `bytes`: deterministic, no I/O, no
third-party libs, safe inside Arrow-batched `mapInPandas` workers.

Reference scope note: the reference pipeline has no binary media
handling at all (payloads are JSON text end-to-end, e.g.
/root/reference/src/pipeline/core/kafka_multi_consumer.py:81); this is
training-pipeline surface beyond it, per the builder's brief.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """Spec-valid mono 16-bit PCM WAV whose sample i is
    `((seed + 37*i) % 65536) - 32768` — deterministic, so an oracle can
    recompute the sample sum from (seed, n_samples) arithmetic."""
    if n_samples < 1 or sample_rate < 1:
        raise ValueError("wav: n_samples and sample_rate must be >= 1")
    i = np.arange(n_samples, dtype=np.int64)
    samples = ((seed + 37 * i) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,            # audio format: PCM
        1,            # channels: mono
        sample_rate,
        sample_rate * 2,  # byte rate = rate * block_align
        2,            # block align = channels * bits/8
        16,           # bits per sample
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks pad to even
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> dict:
    """Decode a RIFF/WAVE payload: generic chunk walk → fmt parse →
    PCM sample decode + sum. Returns sample_rate/channels/bit_depth/
    n_samples/duration_us/sample_sum (sum is None for non-16-bit-PCM
    payloads — the header-only path, like the JPEG SOF parse)."""
    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        ctype = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + length]
        if ctype == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length % 2)  # chunks are even-padded
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if channels < 1 or block_align < 1:
        raise ValueError("wav: corrupt fmt chunk")
    n_samples = len(data) // block_align
    sample_sum = None
    if audio_format == 1 and bits == 16:
        frames = np.frombuffer(
            data[: n_samples * block_align], dtype="<i2"
        )
        sample_sum = int(frames.sum(dtype=np.int64))
    return {
        "format": "wav",
        "sample_rate": sample_rate,
        "channels": channels,
        "bit_depth": bits,
        "n_samples": n_samples,
        "duration_us": n_samples * 1_000_000 // sample_rate,
        "sample_sum": sample_sum,
    }
