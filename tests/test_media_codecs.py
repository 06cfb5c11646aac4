"""From-scratch BMP/WAV codecs: round-trip identity, padding edge cases,
malformed-payload errors, and the Spark decode passes."""

import numpy as np
import pytest

from lucene_solr_spark.operators.media_codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def test_bmp_roundtrip_identity_various_shapes():
    rng = np.random.RandomState(7)
    # widths chosen to hit all 4 row-padding cases (w*3 % 4 = 0..3)
    for h, w in [(1, 1), (3, 2), (5, 3), (4, 4), (17, 23), (32, 64)]:
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_bmp(px)
        assert data[:2] == b"BM"
        out = decode_bmp(data)
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, px)


def test_bmp_rejects_bad_payloads():
    with pytest.raises(ValueError):
        decode_bmp(b"JFIF not a bmp")
    # unsupported bpp: craft a header claiming 8-bit
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(px))
    data[28] = 8  # biBitCount
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))


def test_wav_roundtrip_identity():
    rng = np.random.RandomState(11)
    for n, rate in [(1, 8000), (255, 16000), (4096, 44100)]:
        s = rng.randint(-32768, 32768, n).astype(np.int16)
        data = encode_wav(s, rate)
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        got_rate, ch, out = decode_wav(data)
        assert got_rate == rate and ch == 1
        assert np.array_equal(out, s)


def test_wav_odd_data_chunk_word_alignment():
    # an odd-sized intervening chunk must not desync chunk walking
    s = np.array([1, -2, 3], dtype=np.int16)
    data = encode_wav(s, 8000)
    # splice an odd-length junk chunk between WAVE and fmt
    import struct

    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    spliced = data[:12] + junk + data[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, ch, out = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out, s)


def test_wav_rejects_bad_payloads():
    with pytest.raises(ValueError):
        decode_wav(b"OggS not a wav")


def test_spark_decode_passes_match_numpy(spark):
    from lucene_solr_spark.operators.multimodal import (
        decode_audio,
        decode_images,
        synthesize_bmp_payloads,
        synthesize_wav_payloads,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    img = {r.doc_id: r for r in decode_images(synthesize_bmp_payloads(docs)).collect()}
    for did in range(12):
        w, h = 8 + did % 16, 8 + (3 * did) % 16
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        px = (did + x + 31 * y + 7 * c) % 256
        r = img[did]
        assert (r.width, r.height) == (w, h)
        assert r.px_sum == int(px.sum())
        assert r.px_max == int(px.max())
    aud = {r.doc_id: r for r in decode_audio(synthesize_wav_payloads(docs)).collect()}
    for did in range(12):
        n = 256 + did % 128
        i = np.arange(n)
        s = (7 * did + 13 * i) % 4096 - 2048
        r = aud[did]
        assert r.n_samples == n and r.sample_rate == 8000 + 4000 * (did % 4)
        assert r.abs_sum == int(np.abs(s).sum())
        assert (r.s_min, r.s_max) == (int(s.min()), int(s.max()))


def test_resize_images_nearest_neighbor(spark):
    import numpy as np

    from lucene_solr_spark.operators.media_codecs import encode_bmp
    from lucene_solr_spark.operators.multimodal import resize_images

    # 4x6 gradient image, resized to 2x3 and to 1x1
    y, x, c = np.ogrid[0:4, 0:6, 0:3]
    px = ((5 * y + 2 * x + c) % 256).astype(np.uint8)
    df = spark.createDataFrame([(0, bytearray(encode_bmp(px)))], "doc_id long, payload binary")

    got = resize_images(df, 3, 2).collect()[0]
    ys = (np.arange(2) * 4) // 2
    xs = (np.arange(3) * 6) // 3
    res = px[ys[:, None], xs[None, :], :]
    assert (got["width"], got["height"]) == (3, 2)
    assert got["px_sum"] == int(res.sum())
    # probe clamps to (min(3, h-1), min(5, w-1), 1) = (1, 2, 1)
    assert got["px_probe"] == int(res[1, 2, 1])

    one = resize_images(df, 1, 1).collect()[0]
    assert one["px_sum"] == int(px[0, 0, :].sum())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        resize_images(df, 0, 2)
