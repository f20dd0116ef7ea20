"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas — schema, decode stub, deterministic pseudo-features."""

from __future__ import annotations

import pytest

from bigdata_usaspending_spark.catalog import load
from bigdata_usaspending_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, mm.pack_fake_image(640, 480, b"pixels"), "image/fake", "s3://a/1"),
        (2, mm.pack_fake_image(32, 32), "image/fake", "s3://a/2"),
        (3, b"\x00\x01garbage", "image/fake", "s3://a/3"),  # undecodable
        (4, None, "image/fake", "s3://a/4"),                # missing payload
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_meta(media):
    got = {r.media_id: r for r in mm.decode_image_meta(media).collect()}
    assert (got[1].width, got[1].height, got[1].ok) == (640, 480, True)
    assert (got[2].width, got[2].height) == (32, 32)
    # poisoned blob reported, not raised — a bad record must not kill a scan
    assert got[3].ok is False and got[3].byte_len == 9
    assert got[4].ok is False


def test_features_deterministic_and_fixed_dim(media):
    a = {r.media_id: r.features for r in mm.extract_features(media).collect()}
    b = {r.media_id: r.features for r in mm.extract_features(media).collect()}
    assert a == b
    assert len(a[1]) == mm.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in a[1])
    assert a[4] is None


def test_media_from_documents(spark, sf_small):
    docs = load(spark, sf_small, "documents")
    media = mm.media_from_documents(docs)
    assert media.columns == ["media_id", "content", "mime_type", "source_uri"]
    row = media.first()
    assert isinstance(row.content, (bytes, bytearray))
    feats = mm.extract_features(media.limit(5))
    assert feats.count() == 5
