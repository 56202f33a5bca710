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


def test_resize_truncates_to_budget(spark):
    out = {
        r["media_id"]: r
        for r in mm.resize_images(mm.media_from_documents(_docs(spark)), max_dim=8).collect()
    }
    assert set(out) == {0, 3}  # images only
    assert out[0]["byte_len"] == 64 and len(out[0]["payload"]) == 64
    assert out[3]["byte_len"] == 0


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
