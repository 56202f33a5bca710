"""Multimodal binary-column plumbing: mapInPandas metadata extraction,
resize kernel contract, and 1→N frame sampling."""

from pyspark.sql import functions as F

from trading_etl_spark.operators import multimodal as mm

DOC_SCHEMA = "doc_id long, text string"


def _docs(spark):
    rows = [
        (0, "a" * 300),  # image (0 % 3)
        (1, "b" * 10),   # audio
        (2, "c" * 700),  # video → 3 frames at 256-byte stride
        (3, ""),         # image, empty payload
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_media_table_schema(spark):
    media = mm.media_from_documents(_docs(spark))
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "payload"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    types = {r["media_id"]: r["media_type"] for r in media.collect()}
    assert types == {0: "image", 1: "audio", 2: "video", 3: "image"}


def test_extract_meta_deterministic_fake(spark):
    meta = {
        r["media_id"]: r
        for r in mm.extract_media_meta(mm.media_from_documents(_docs(spark))).collect()
    }
    img = meta[0]
    assert (img["byte_len"], img["width"], img["height"]) == (300, 300 % 640 + 1, 300 * 7 % 480 + 1)
    assert img["sample_rate"] == 0
    aud = meta[1]
    assert (aud["width"], aud["height"], aud["sample_rate"]) == (0, 0, 8000 + 10 % 8 * 1000)
    vid = meta[2]
    assert vid["width"] > 0 and vid["sample_rate"] > 0
    assert meta[3]["byte_len"] == 0


def _ref_pixels(doc_id: int):
    import numpy as np

    w, h = doc_id % 24 + 8, doc_id % 16 + 8
    y, x, c = np.ogrid[:h, :w, :3]
    return ((13 * doc_id + 7 * y + 3 * x + c) % 256).astype(np.uint8)


def test_bmp_roundtrip_with_row_padding():
    import numpy as np

    # w=5 → 15-byte rows padded to 16: the padding path must roundtrip
    arr = (np.arange(4 * 5 * 3).reshape(4, 5, 3) * 17 % 256).astype(np.uint8)
    data = mm.encode_bmp(arr)
    assert data[:2] == b"BM" and len(data) == 54 + 4 * 16
    assert np.array_equal(mm.decode_bmp(data), arr)


def test_resize_max_dim_matches_numpy_reference():
    import numpy as np

    arr = _ref_pixels(23)  # w=31, h=15 → must downscale
    out = mm.resize_max_dim(arr, 16)
    h, w = arr.shape[:2]
    new_w, new_h = max(1, w * 16 // max(h, w)), max(1, h * 16 // max(h, w))
    assert out.shape == (new_h, new_w, 3)
    for yo in range(new_h):
        for xo in range(new_w):
            assert np.array_equal(out[yo, xo], arr[yo * h // new_h, xo * w // new_w])
    # below-threshold input passes through untouched
    small = _ref_pixels(1)  # 9x9
    assert mm.resize_max_dim(small, 16) is not None
    assert np.array_equal(mm.resize_max_dim(small, 16), small)


def test_resize_images_real_pixels_end_to_end(spark):
    """The Spark kernel's output payloads decode to exactly the NumPy
    reference pipeline's pixels (synthesize → nearest-neighbor → re-encode),
    and the reported dims/byte_len match the BMP layout."""
    import numpy as np

    docs = spark.createDataFrame([(7, "x"), (30, "y"), (1, "z")], DOC_SCHEMA)
    out = {
        r["media_id"]: r
        for r in mm.resize_images(mm.bmp_media_from_documents(docs), max_dim=16).collect()
    }
    assert set(out) == {7, 30, 1}
    for did in (7, 30, 1):
        ref = mm.resize_max_dim(_ref_pixels(did), 16)
        row = out[did]
        got = mm.decode_bmp(bytes(row["payload"]))
        assert np.array_equal(got, ref), f"pixel mismatch for doc {did}"
        assert (row["height"], row["width"]) == ref.shape[:2]
        stride = (3 * row["width"] + 3) // 4 * 4
        assert row["byte_len"] == 54 + stride * row["height"] == len(bytes(row["payload"]))


def test_non_bmp_payload_needs_codec():
    import pytest

    with pytest.raises(NotImplementedError, match="PIL"):
        mm.decode_bmp(b"\x89PNG\r\n\x1a\n....")
    # compressed/odd-depth BMP variants are also gated, not mis-decoded
    import numpy as np

    data = bytearray(mm.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    data[28:30] = (8).to_bytes(2, "little")  # claim 8-bit palette
    with pytest.raises(NotImplementedError, match="24-bit"):
        mm.decode_bmp(bytes(data))


def test_frame_sample_fanout_and_order(spark):
    frames = mm.sample_frames(mm.media_from_documents(_docs(spark))).collect()
    assert {r["media_id"] for r in frames} == {2}  # videos only
    idxs = sorted(r["frame_idx"] for r in frames)
    assert idxs == [0, 1, 2]  # 700 bytes / 256 stride → 3 frames
    by_idx = {r["frame_idx"]: bytes(r["frame"]) for r in frames}
    assert by_idx[0] == b"c" * 16
    assert by_idx[2] == b"c" * 16  # last frame still has 188 bytes ≥ frame_len


def test_payload_never_in_meta_plan(spark):
    """Metadata consumers project only small columns — the binary payload
    column must not appear in the aggregate's output schema."""
    meta = mm.extract_media_meta(mm.media_from_documents(_docs(spark)))
    agg = meta.groupBy("media_type").agg(F.sum("byte_len").alias("total_bytes"))
    assert "payload" not in agg.columns
    assert agg.count() == 3


def test_wav_roundtrip_and_decode_gates():
    """encode_wav → decode_wav is lossless for 16-bit mono PCM; non-RIFF
    and non-PCM payloads raise the honesty gate."""
    import numpy as np
    import pytest

    from trading_etl_spark.operators.multimodal import decode_wav, encode_wav

    s = ((np.arange(300, dtype=np.int64) * 1103 + 7) % 65536 - 32768).astype("<i2")
    data = encode_wav(s, 12000)
    back, rate = decode_wav(data)
    assert rate == 12000 and np.array_equal(back, s)

    with pytest.raises(NotImplementedError, match="RIFF"):
        decode_wav(b"\x89PNG not audio at all")
    # flip the fmt tag to 3 (IEEE float) — needs a real codec
    bad = bytearray(data)
    bad[20] = 3
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bytes(bad))


def test_audio_features_match_numpy_reference(spark):
    """The full WAV pipeline (synthesize → RIFF decode → reduce) pinned to
    an independent NumPy recomputation from the closed-form model."""
    import numpy as np

    from trading_etl_spark.operators.multimodal import (
        audio_features,
        wav_media_from_documents,
    )

    docs = spark.createDataFrame([(7,), (42,), (101,)], "doc_id long")
    got = {
        r["media_id"]: r
        for r in audio_features(wav_media_from_documents(docs)).collect()
    }
    for did in (7, 42, 101):
        n = did % 400 + 100
        rate = 8000 + did % 4 * 4000
        i = np.arange(n, dtype=np.int64)
        v = (did * 31 + i * 17) % 65536 - 32768
        r = got[did]
        assert r["n_samples"] == n and r["sample_rate"] == rate
        assert r["duration_sec"] == np.floor(n / rate * 1e6 + 0.5) / 1e6
        assert r["rms"] == np.floor(np.sqrt(np.mean(v * v)) * 1e6 + 0.5) / 1e6
        assert r["peak"] == int(np.max(np.abs(v)))
        assert r["zero_crossings"] == int(np.sum(v[:-1] * v[1:] < 0))


def test_image_dhash_matches_numpy_reference(spark):
    """Full dHash pipeline (synthesize BMP → decode → gray → 9×8 sample →
    pack) pinned to an independent NumPy recomputation from the pixel
    model, including a doc whose hash would exercise high bit positions."""
    import numpy as np

    from trading_etl_spark.operators.multimodal import (
        bmp_media_from_documents,
        image_dhash,
    )

    docs = spark.createDataFrame([(3,), (55,), (128,)], "doc_id long")
    got = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(bmp_media_from_documents(docs)).collect()
    }
    for did in (3, 55, 128):
        w, h = did % 24 + 8, did % 16 + 8
        y, x, c = np.ogrid[:h, :w, :3]
        px = (13 * did + 7 * y + 3 * x + c) % 256
        gray = px.astype(np.int64).sum(axis=2) // 3
        g = gray[np.ix_(np.arange(8) * h // 8, np.arange(9) * w // 9)]
        bits = (g[:, :8] > g[:, 1:]).astype(np.int64)
        idx = np.arange(8)
        expect = int((bits << (idx[:, None] * 8 + idx[None, :])).sum())
        assert got[did] == expect


def test_codec_roundtrips_property():
    """Property: encode→decode is the identity for ANY image shape /
    sample count in the supported envelope (hypothesis-driven — catches
    stride/padding bugs the fixed-size tests can miss)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trading_etl_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
    )
    def bmp_roundtrip(w, h, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(0, 2000),
        rate=st.sampled_from([8000, 11025, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_roundtrip(n, rate, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=n, dtype=np.int64).astype("<i2")
        back, r = decode_wav(encode_wav(s, rate))
        assert r == rate and np.array_equal(back, s)

    bmp_roundtrip()
    wav_roundtrip()
