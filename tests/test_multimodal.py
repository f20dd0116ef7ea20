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


@pytest.mark.slow
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


@pytest.mark.slow
def test_media_embed_then_search_and_dedup_pipeline(spark, sf_small):
    """End-to-end training-data flow: opaque blobs -> Arrow-batched feature
    extraction -> similarity search + embedding dedup over the features.
    This is the composition a 100-TB media pipeline runs (decode stub swaps
    for a real encoder; everything downstream is unchanged)."""
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.operators import similarity

    docs = load(spark, sf_small, "documents").limit(50)
    media = mm.media_from_documents(docs)
    # plant an exact duplicate blob of media_id=min under a new id
    first = media.orderBy("media_id").first()
    dup = spark.createDataFrame(
        [(999_999, first.content, first.mime_type, "synthetic://dup")],
        mm.MEDIA_SCHEMA,
    )
    feats = mm.extract_features(media.unionByName(dup)).filter(
        F.col("features").isNotNull()
    )

    # search: the duplicate must be the nearest neighbor of the original
    q = feats.filter(F.col("media_id") == first.media_id).select(
        F.col("features").alias("q_emb")
    )
    top = similarity.brute_force_topk(
        feats.filter(F.col("media_id") != first.media_id), q,
        id_col="media_id", vec_col="features", k=1,
    ).first()
    assert top.media_id == 999_999 and abs(top.cosine - 1.0) < 1e-12

    # dedup: identical features = near-dup pair within one block
    pairs = similarity.cosine_pairs_blocked(
        feats.withColumn("label", F.lit(0)), "label",
        id_col="media_id", vec_col="features", threshold=0.999999,
    ).collect()
    assert (first.media_id, 999_999) in {(r.id_a, r.id_b) for r in pairs}


def test_decode_real_png_header(spark):
    """decode_image_meta parses genuine PNG bytes (zlib-built 3x2 RGB image,
    valid end-to-end: signature, IHDR, IDAT, IEND), not just the fixture
    format; truncated/corrupt PNGs report ok=False instead of raising."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    w, h = 3, 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    media = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(png[:10])), (3, bytearray(b"\x89PNG\r\n\x1a\nJUNKJUNKJUNKJUNKJUNK"))],
        "media_id long, content binary",
    )
    out = {r.media_id: r for r in mm.decode_image_meta(media).collect()}
    assert (out[1].width, out[1].height, out[1].ok) == (w, h, True)
    assert out[2].ok is False and out[3].ok is False


def test_decode_one_pil_branch(monkeypatch):
    """Both raster-decode branches: with PIL absent unknown formats report
    ok=False; with a (faked) PIL present the decoder returns its dimensions,
    and codec exceptions still degrade to ok=False instead of raising."""
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"payload-bytes" * 3

    # branch 1: no PIL -> undecodable, never raises
    monkeypatch.setattr(mm, "_PIL_IMAGE", None)
    assert mm._decode_one(jpeg_ish) == (len(jpeg_ish), 0, 0, False)

    # branch 2: PIL present -> size reported
    class _FakeImg:
        size = (640, 480)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakePIL:
        @staticmethod
        def open(fh):
            if fh.read(4) != b"\xff\xd8\xff\xe0":
                raise OSError("cannot identify image file")
            return _FakeImg()

    monkeypatch.setattr(mm, "_PIL_IMAGE", _FakePIL)
    assert mm._decode_one(jpeg_ish) == (len(jpeg_ish), 640, 480, True)
    # decode error degrades, not raises
    assert mm._decode_one(b"not-an-image-at-all!") == (20, 0, 0, False)
    # FAKE/PNG fast paths take precedence over PIL
    assert mm._decode_one(mm.pack_fake_image(3, 4)) == (8, 3, 4, True)


def test_decode_gif_and_webp_headers():
    """Dependency-free GIF / WebP dimension parses against spec-built blobs."""
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    assert mm._decode_one(gif) == (len(gif), 320, 200, True)
    # truncated GIF magic only -> undecodable
    assert mm._decode_one(b"GIF89a")[3] is False

    # VP8 lossy: RIFF header, 'VP8 ' chunk, 3-byte frame tag, start code,
    # then 14-bit u16le dims
    vp8_payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 800, 600)
    vp8 = b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8_payload)) + b"WEBP"
    vp8 += b"VP8 " + struct.pack("<I", len(vp8_payload)) + vp8_payload
    assert mm._decode_one(vp8) == (len(vp8), 800, 600, True)

    # VP8L lossless: 0x2F signature then packed 14-bit width-1/height-1
    bits = (1023 - 1) | ((767 - 1) << 14)
    vp8l_payload = b"\x2f" + struct.pack("<I", bits)
    vp8l = b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8l_payload)) + b"WEBP"
    vp8l += b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    assert mm._decode_one(vp8l) == (len(vp8l), 1023, 767, True)

    # VP8X extended: flags + reserved, then 24-bit LE canvas dims - 1
    vp8x_payload = b"\x00\x00\x00\x00" + (4095).to_bytes(3, "little") + (
        2159
    ).to_bytes(3, "little")
    vp8x = b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8x_payload)) + b"WEBP"
    vp8x += b"VP8X" + struct.pack("<I", len(vp8x_payload)) + vp8x_payload
    assert mm._decode_one(vp8x) == (len(vp8x), 4096, 2160, True)

    # corrupt container (WEBP tag missing) -> undecodable, never raises
    bad = b"RIFF" + struct.pack("<I", 20) + b"NOPE" + b"\x00" * 20
    assert mm._decode_one(bad)[3] is False


def test_decode_audio_meta_wav(spark):
    """decode_audio_meta: real RIFF chunk walk over Spark, malformed blobs
    degrade to ok=False."""
    wav = mm.pack_wav(sample_rate=16000, channels=2, bits_per_sample=16, n_frames=8000)
    media = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not audio")), (3, None)],
        "media_id long, content binary",
    )
    out = {r.media_id: r for r in mm.decode_audio_meta(media).collect()}
    row = out[1]
    assert (row.sample_rate, row.channels, row.bits_per_sample, row.ok) == (
        16000, 2, 16, True,
    )
    assert row.duration_s == 0.5
    assert out[2].ok is False and out[3].ok is False

    # chunk walk must skip unknown chunks before fmt/data (LIST etc.)
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE"
    body += b"LIST" + struct.pack("<I", 4) + b"INFO"      # skipped chunk
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4000) + b"\x00" * 4000
    wav2 = b"RIFF" + struct.pack("<I", len(body)) + body
    media2 = spark.createDataFrame(
        [(9, bytearray(wav2))], "media_id long, content binary"
    )
    row2 = mm.decode_audio_meta(media2).collect()[0]
    assert (row2.sample_rate, row2.channels, row2.duration_s, row2.ok) == (
        8000, 1, 0.5, True,
    )


def test_resize_images_stub_contract(spark):
    """FAKE blobs resize via header arithmetic: longer side bounded,
    aspect preserved, never upscaled, payload untouched; non-image blobs
    degrade to ok=False."""
    from bigdata_usaspending_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [
            (1, mm.pack_fake_image(1024, 512, b"pp"), "image/fake", "u1"),
            (2, mm.pack_fake_image(100, 400, b""), "image/fake", "u2"),
            (3, mm.pack_fake_image(64, 64, b"x"), "image/fake", "u3"),
            (4, b"not an image", "application/octet-stream", "u4"),
            (5, None, None, "u5"),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in mm.resize_images(media, max_side=256).collect()}
    assert (out[1].width, out[1].height, out[1].ok) == (256, 128, True)
    assert bytes(out[1].content)[8:] == b"pp"          # payload preserved
    assert (out[2].width, out[2].height) == (64, 256)  # portrait scaling
    assert (out[3].width, out[3].height) == (64, 64)   # never upscaled
    assert bytes(out[3].content) == bytes(mm.pack_fake_image(64, 64, b"x"))
    assert out[4].ok is False and out[4].content is None
    assert out[5].ok is False

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_side"):
        mm.resize_images(media, max_side=0)


def test_sample_video_frames_expansion_and_degradation(spark):
    """One input row expands to one row per sampled frame (frame 0 always
    kept, every_n stride, fps-derived timestamps); non-video blobs yield
    a single ok=False row so provenance survives."""
    from bigdata_usaspending_spark.operators import multimodal as mm

    frames = [bytes([i]) * 3 for i in range(7)]
    media = spark.createDataFrame(
        [
            (1, mm.pack_fake_video(10, frames), "video/fake", "v1"),
            (2, b"mp4-without-codec", "video/mp4", "v2"),
            (3, None, None, "v3"),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.sample_video_frames(media, every_n=3).collect()
    sampled = [r for r in rows if r.media_id == 1]
    assert [(r.frame_index, r.timestamp_s) for r in sampled] == [
        (0, 0.0), (3, 0.3), (6, 0.6),
    ]
    assert [bytes(r.frame) for r in sampled] == [frames[0], frames[3], frames[6]]
    assert all(r.ok for r in sampled)
    deg = {r.media_id: r for r in rows if r.media_id != 1}
    assert deg[2].ok is False and deg[2].frame is None
    assert deg[3].ok is False

    # plan: pure map — no exchange
    plan = (
        mm.sample_video_frames(media, every_n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "MapInPandas" in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="every_n"):
        mm.sample_video_frames(media, every_n=0)
