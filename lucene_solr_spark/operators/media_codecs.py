"""Real from-scratch codecs for uncompressed media: BMP (BI_RGB 24-bit) and
WAV (RIFF PCM 16-bit) — pure numpy/struct, no external libraries.

This upgrades the multimodal column story (`operators/multimodal.py`) from
"decode stubbed" to "real decode for uncompressed formats, stub only for
compressed ones (JPEG/PNG/MP3 need PIL/ffmpeg, absent from this
container)".  Both formats are public specifications:

- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  bottom-up BGR rows padded to 4-byte multiples, compression BI_RGB.
- WAV: RIFF container, ``fmt `` chunk (PCM, 16-bit LE) + ``data`` chunk.

Feature extraction on the decoded arrays (pixel sums, RMS/zero-crossings)
is real DSP, and the contract queries verify the FULL round trip without
the oracle ever touching bytes: payloads are synthesized from doc_id
arithmetic, so every decoded feature has a closed form DuckDB reproduces
from doc_id alone — if encoder, decoder, or feature pass drifted by one
byte, the hashes would diverge.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_wav",
    "decode_wav",
]


# ------------------------------------------------------------------ BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an ``(H, W, 3)`` uint8 RGB array as a 24-bit BI_RGB BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (H, W, 3)")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    image_size = stride * h
    data_offset = 14 + 40
    file_size = data_offset + image_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    # bottom-up rows, BGR order
    bgr = pixels[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = np.ascontiguousarray(bgr).tobytes()
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP into an ``(H, W, 3)`` uint8 RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, file_size, _, _, data_offset) = struct.unpack_from("<2sIHHI", data, 0)
    (hsize, w, h, planes, bpp, comp) = struct.unpack_from("<IiiHHI", data, 14)
    if hsize < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    body = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ------------------------------------------------------------------ WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """Encode int16 PCM ``samples`` (1-D, interleaved if multi-channel) as a
    RIFF/WAVE file."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes):
    """Decode a PCM-16 RIFF/WAVE payload → ``(sample_rate, channels,
    samples)`` with ``samples`` a 1-D int16 array (interleaved)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    sample_rate = channels = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            (audio_format, channels, sample_rate, _, _, bits) = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_format != 1 or bits != 16:
                raise ValueError(f"unsupported WAV variant (format={audio_format}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunks")
    return sample_rate, channels, samples
