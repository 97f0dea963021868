"""Multimodal plumbing: binary round-trip, mapInPandas feature batches,
stubbed decode behavior, frame sampling."""

import pytest
from pyspark.sql import functions as F

from cdc2vec_spark.io import load_table
from cdc2vec_spark.operators import multimodal as mm


def test_media_roundtrip(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    m = mm.with_media(d)
    row = m.join(d, "doc_id").select("media", "text", "media_meta").first()
    assert bytes(row["media"]).decode("utf-8") == row["text"]
    assert row["media_meta"]["n_bytes"] == len(bytes(row["media"]))
    assert row["media_meta"]["kind"] == "text/plain"


def test_feature_extraction_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    m = mm.with_media(d)
    a = {r["doc_id"]: r["features"] for r in mm.extract_features(m).collect()}
    b = {r["doc_id"]: r["features"] for r in mm.extract_features(m).collect()}
    assert a == b and len(a) == 20
    for v in a.values():
        assert len(v) == 16 and abs(sum(v) - 1.0) < 1e-4


def test_decode_stub_raises_for_real_media():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "image/png")


def test_decode_text_plain():
    arr = mm.decode_media(b"ab", "text/plain")
    assert arr.tolist() == [97, 98]


def test_frame_sample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(5)
    out = mm.frame_sample(mm.with_media(d), every=4).collect()
    for r in out:
        assert r["n_frames"] == len(r["frames"]) > 0


def test_resize_media_bounds_and_determinism(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    small = mm.resize_media(mm.with_media(d), target_bytes=32)
    rows = {r["doc_id"]: r for r in small.collect()}
    rows2 = {r["doc_id"]: r for r in mm.resize_media(mm.with_media(d), 32).collect()}
    assert rows.keys() == rows2.keys()
    for k, r in rows.items():
        assert len(r["media"]) <= 32
        assert r["media_meta"]["n_bytes"] == len(r["media"])
        assert r["media"] == rows2[k]["media"]  # deterministic
    # strided selection keeps the first byte of the original blob
    orig = {r["doc_id"]: r["media"] for r in mm.with_media(d).collect()}
    for k, r in rows.items():
        if len(orig[k]) > 0:
            assert r["media"][0] == orig[k][0]


def test_decode_media_stub_raises_for_real_kinds():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "image/png")


def test_frame_sample_empty_blob(spark):
    """Zero-byte media must yield an empty frames array, not a
    sequence-boundary error."""
    df = spark.createDataFrame([(1, "abcdefgh"), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in mm.frame_sample(mm.with_media(df), every=4).collect()}
    assert rows[2]["n_frames"] == 0 and rows[2]["frames"] == []
    assert rows[1]["n_frames"] == 2
