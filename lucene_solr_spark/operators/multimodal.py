"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training pipeline carries image/audio/video as opaque ``binary``
columns next to typed metadata, and runs decode / feature-extract /
frame-sample as Arrow-batched UDFs.  The decode libraries (PIL, ffmpeg, ...)
are NOT in this container, so the codec step for COMPRESSED formats is
STUBBED with a deterministic fake — but uncompressed formats now have REAL
from-scratch codecs (`media_codecs.py`: BMP BI_RGB 24-bit and RIFF PCM-16
WAV, pure numpy/struct) driven by `decode_images` / `decode_audio` below,
and everything Spark-side is real and tested: schema, partitioning, UDF
signature, Arrow batch shape.

``decode_stub`` derives "image" metadata purely from the bytes (length,
fake dimensions, checksum) so the DuckDB oracle can verify the plumbing
end-to-end with blob functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

DECODE_AVAILABLE = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    DECODE_AVAILABLE = True
except ImportError:
    pass


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a synthetic binary payload column (UTF-8 bytes of the text).

    Stand-in for reading real image/audio bytes; the downstream plumbing is
    identical whatever produced the blob.
    """
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("image/fake")
    )


def _real_decode(payloads: pd.Series) -> pd.DataFrame:  # pragma: no cover
    raise NotImplementedError(
        "real image decode needs PIL/libvips — not available in this container; "
        "swap this function in production, the Spark plumbing is unchanged"
    )


def decode_stub(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: metadata derived from the raw bytes only.

    width  = 64 + byte_len % 512   (fake but stable)
    height = 64 + (byte_len * 31) % 512
    checksum = sum of bytes mod 2^31
    """
    blens = payloads.map(len).to_numpy(dtype=np.int64)
    checks = payloads.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()) % (1 << 31)).to_numpy(
        dtype=np.int64
    )
    return pd.DataFrame(
        {
            "byte_len": blens,
            "width": 64 + blens % 512,
            "height": 64 + (blens * 31) % 512,
            "checksum": checks,
        }
    )


def extract_media_meta(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """mapInPandas decode pass: (doc_id, byte_len, width, height, checksum).

    One Arrow batch in, one metadata frame out — the exact shape a real
    decoder plugs into (swap ``decode_stub`` for ``_real_decode``).
    """
    decode = _real_decode if use_real_codec else decode_stub

    def fn(iterator):
        for pdf in iterator:
            meta = decode(pdf["payload"])
            meta.insert(0, "doc_id", pdf["doc_id"].to_numpy(dtype=np.int64))
            yield meta

    schema = "doc_id bigint, byte_len bigint, width bigint, height bigint, checksum bigint"
    return df.select("doc_id", "payload").mapInPandas(fn, schema=schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: explode each payload into per-"frame" rows
    (offset, frame_byte) every `every_n_bytes` — the partitioning/batch shape
    of real video frame extraction, with bytes standing in for frames."""

    def fn(iterator):
        for pdf in iterator:
            ids, offs, vals = [], [], []
            for did, payload in zip(pdf["doc_id"].to_numpy(dtype=np.int64), pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)[::every_n_bytes]
                ids.append(np.full(arr.size, did, dtype=np.int64))
                offs.append(np.arange(arr.size, dtype=np.int64) * every_n_bytes)
                vals.append(arr.astype(np.int64))
            if not ids:
                continue
            yield pd.DataFrame(
                {"doc_id": np.concatenate(ids), "offset": np.concatenate(offs), "frame_byte": np.concatenate(vals)}
            )

    return df.select("doc_id", "payload").mapInPandas(fn, schema="doc_id bigint, offset bigint, frame_byte bigint")


# --------------------------------------------------------------------------
# Real uncompressed-media path (operators/media_codecs.py): BMP + WAV codecs
# written from scratch on the public file formats — decode is NOT stubbed
# for these; only compressed formats (JPEG/MP3/...) remain behind the stub.
# --------------------------------------------------------------------------


def synthesize_bmp_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic per-doc BMP payloads: W = 8 + id % 16, H = 8 + 3·id %
    16, pixel[y, x, c] = (id + x + 31y + 7c) mod 256.  Every decoded
    feature therefore has a closed form in doc_id — the oracle re-derives
    them without parsing a byte, so a contract match proves the whole
    encode→bytes→decode→feature chain."""
    from .media_codecs import encode_bmp

    def fn(iterator):
        for pdf in iterator:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            payloads = []
            for did in ids:
                w = 8 + int(did) % 16
                h = 8 + (3 * int(did)) % 16
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                px = ((int(did) + x + 31 * y + 7 * c) % 256).astype(np.uint8)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    from ..session import spread_partitions

    # single-file doc tables arrive as ONE partition; the codec chain
    # downstream is per-row Python — widen first (no-op on partitioned input)
    return spread_partitions(docs.select("doc_id")).mapInPandas(
        fn, "doc_id bigint, payload binary"
    )


def decode_images(df: DataFrame) -> DataFrame:
    """REAL image decode (BMP): (doc_id, width, height, px_sum, px_max)."""
    from .media_codecs import decode_bmp

    def fn(iterator):
        for pdf in iterator:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            rows = {"doc_id": ids, "width": [], "height": [], "px_sum": [], "px_max": []}
            for payload in pdf["payload"]:
                px = decode_bmp(bytes(payload))
                rows["width"].append(px.shape[1])
                rows["height"].append(px.shape[0])
                rows["px_sum"].append(int(px.sum(dtype=np.int64)))
                rows["px_max"].append(int(px.max()))
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(
        fn, "doc_id bigint, width bigint, height bigint, px_sum bigint, px_max bigint"
    )


def synthesize_wav_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic per-doc PCM WAV: n = 256 + id % 128 samples at rate
    8000 + 4000·(id % 4), s_i = ((7·id + 13·i) mod 4096) - 2048."""
    from .media_codecs import encode_wav

    def fn(iterator):
        for pdf in iterator:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            payloads = []
            for did in ids:
                n = 256 + int(did) % 128
                rate = 8000 + 4000 * (int(did) % 4)
                i = np.arange(n, dtype=np.int64)
                s = ((7 * int(did) + 13 * i) % 4096 - 2048).astype(np.int16)
                payloads.append(encode_wav(s, rate))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    from ..session import spread_partitions

    # single-file doc tables arrive as ONE partition; the codec chain
    # downstream is per-row Python — widen first (no-op on partitioned input)
    return spread_partitions(docs.select("doc_id")).mapInPandas(
        fn, "doc_id bigint, payload binary"
    )


def decode_audio(df: DataFrame) -> DataFrame:
    """REAL audio decode (RIFF PCM-16): per-doc sample stats
    (doc_id, sample_rate, n_samples, abs_sum, s_min, s_max)."""
    from .media_codecs import decode_wav

    def fn(iterator):
        for pdf in iterator:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            rows = {
                "doc_id": ids,
                "sample_rate": [],
                "n_samples": [],
                "abs_sum": [],
                "s_min": [],
                "s_max": [],
            }
            for payload in pdf["payload"]:
                rate, _ch, s = decode_wav(bytes(payload))
                s64 = s.astype(np.int64)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(s.size)
                rows["abs_sum"].append(int(np.abs(s64).sum()))
                rows["s_min"].append(int(s64.min()))
                rows["s_max"].append(int(s64.max()))
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(
        fn,
        "doc_id bigint, sample_rate bigint, n_samples bigint, "
        "abs_sum bigint, s_min bigint, s_max bigint",
    )

def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize (nearest-neighbor): decode each BMP, sample the
    source grid at ``src_y = y * H // out_h``, ``src_x = x * W // out_w``
    (the standard floor-mapping nearest-neighbor), and emit integer-exact
    features of the RESIZED pixel grid: ``(doc_id, width, height, px_sum,
    px_probe)`` where ``px_probe`` is the resized pixel at (y=3, x=5, c=1).

    Integer-exact by construction, so an oracle with a closed pixel form can
    re-derive px_sum/px_probe without touching a byte.  One Arrow batch pass
    per partition; per-image work is a numpy fancy-index, no Python pixel
    loops."""
    from .media_codecs import decode_bmp

    if out_w < 1 or out_h < 1:
        raise ValueError("resize dimensions must be >= 1")

    def fn(iterator):
        for pdf in iterator:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            rows = {"doc_id": ids, "width": [], "height": [], "px_sum": [], "px_probe": []}
            for payload in pdf["payload"]:
                px = decode_bmp(bytes(payload))
                h, w = px.shape[0], px.shape[1]
                ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                res = px[ys[:, None], xs[None, :], :]
                rows["width"].append(out_w)
                rows["height"].append(out_h)
                rows["px_sum"].append(int(res.sum(dtype=np.int64)))
                rows["px_probe"].append(
                    int(res[min(3, out_h - 1), min(5, out_w - 1), 1])
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(
        fn, "doc_id bigint, width bigint, height bigint, px_sum bigint, px_probe bigint"
    )
