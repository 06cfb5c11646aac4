"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training pipeline carries image/audio/video as opaque ``binary``
columns next to typed metadata, and runs decode / feature-extract /
frame-sample as Arrow-batched UDFs.  The decode libraries (PIL, ffmpeg, ...)
are NOT in this container, so the codec step is STUBBED with a deterministic
fake — but everything Spark-side is real and tested: schema, partitioning,
UDF signature, Arrow batch shape.

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
