"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (SURVEY.md §7.4 extension).

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas`` so each partition is processed as
columnar batches (the only sane shape at 100 TB — per-row Python UDFs are
10-100x slower).

Header-only metadata (dimensions, sample rate, duration) parses
dependency-free for PNG / GIF / WebP / PCM-WAV straight from the public
container specs; full raster decode falls back to PIL when installed and
reports ok=False otherwise (this container has no codec libraries), and
``extract_features`` hashes bytes into a fixed-dim pseudo-embedding where a
real pipeline would run its vision/audio encoder. The Spark-side contracts —
schemas, batch iteration, partitioning, column pruning — are real and
tested; swapping in PIL/ffmpeg changes only the body of the pandas
functions.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media row: id + opaque payload + source metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

# deterministic fake header: magic 'FAKE' + u16 width + u16 height
_FAKE_MAGIC = b"FAKE"

# PNG signature (public spec: RFC 2083 / W3C PNG, first 8 bytes) followed by
# the IHDR chunk: 4-byte length, 'IHDR', then u32 width, u32 height (big
# endian) — so width/height live at fixed offsets 16 and 20.
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def pack_fake_image(width: int, height: int, payload: bytes = b"") -> bytes:
    """Build a fake media blob the stub decoder understands (test fixture)."""
    return _FAKE_MAGIC + struct.pack("<HH", width, height) + payload


def _load_pil():
    """Import PIL.Image if available, else None. Module-level cache so the
    import attempt happens once per Python worker, not per blob."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency

        return Image
    except ImportError:
        return None


_PIL_IMAGE = _load_pil()


def _webp_dims(content: bytes) -> tuple[int, int] | None:
    """Dimensions from a WebP container (public spec: RIFF container,
    'VP8 ' lossy / 'VP8L' lossless / 'VP8X' extended first chunk)."""
    if len(content) < 25 or content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        return None
    four_cc = content[12:16]
    if (
        four_cc == b"VP8 "
        and len(content) >= 30
        and content[23:26] == b"\x9d\x01\x2a"
    ):
        # lossy: 3-byte frame tag, 3-byte start code, then 14-bit u16le dims
        w = struct.unpack("<H", content[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", content[28:30])[0] & 0x3FFF
        return w, h
    if four_cc == b"VP8L" and content[20] == 0x2F:
        # lossless: signature byte then 14-bit width-1 / height-1 packed LE
        bits = struct.unpack("<I", content[21:25])[0]
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if four_cc == b"VP8X" and len(content) >= 30:
        # extended: 4 flag/reserved bytes, then 24-bit LE canvas dims - 1
        w = int.from_bytes(content[24:27], "little") + 1
        h = int.from_bytes(content[27:30], "little") + 1
        return w, h
    return None


def _decode_one(content: bytes | None) -> tuple[int, int, int, bool]:
    if content is None:
        return 0, 0, 0, False
    if len(content) >= 8 and content[:4] == _FAKE_MAGIC:
        w, h = struct.unpack("<HH", content[4:8])
        return len(content), w, h, True
    if (
        len(content) >= 24
        and content[:8] == _PNG_MAGIC
        and content[12:16] == b"IHDR"
    ):
        # real PNG header parse (dependency-free): IHDR is mandated to be
        # the first chunk, so width/height are the two big-endian u32s
        # right after its type tag
        w, h = struct.unpack(">II", content[16:24])
        if 0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF:
            return len(content), w, h, True
    if len(content) >= 10 and content[:6] in (b"GIF87a", b"GIF89a"):
        # GIF logical screen descriptor: u16le width at 6, height at 8
        w, h = struct.unpack("<HH", content[6:10])
        if w > 0 and h > 0:
            return len(content), w, h, True
    webp = _webp_dims(content)
    if webp is not None:
        w, h = webp
        if w > 0 and h > 0:
            return len(content), w, h, True
    # Full raster decode (JPEG/WebP/...) runs through PIL when it is
    # installed; in this container it is not, so blobs beyond the formats
    # above report undecodable. Either way a poisoned blob must not kill a
    # 100-TB scan — decode errors degrade to ok=False, never raise.
    if _PIL_IMAGE is not None:
        import io

        try:
            with _PIL_IMAGE.open(io.BytesIO(content)) as img:
                w, h = img.size
                return len(content), int(w), int(h), True
        except Exception:  # noqa: BLE001 — any codec failure means ok=False
            return len(content), 0, 0, False
    return len(content), 0, 0, False


def pack_wav(
    sample_rate: int, channels: int, bits_per_sample: int, n_frames: int
) -> bytes:
    """Minimal PCM WAV blob (header + zeroed data) — test fixture."""
    block_align = channels * bits_per_sample // 8
    data_len = n_frames * block_align
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits_per_sample,
    )
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav(content: bytes | None) -> tuple[int, int, int, int, float, bool]:
    """PCM WAV metadata via a real RIFF chunk walk (public spec). Returns
    (byte_len, sample_rate, channels, bits_per_sample, duration_s, ok);
    malformed blobs degrade to ok=False — a poisoned blob must not kill a
    100-TB scan."""
    if content is None:
        return 0, 0, 0, 0, 0.0, False
    n = len(content)
    if n < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return n, 0, 0, 0, 0.0, False
    pos = 12
    sample_rate = channels = bits = 0
    data_len = -1
    while pos + 8 <= n:
        tag = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        if tag == b"fmt " and pos + 8 + 16 <= n:
            _, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", content[pos + 8 : pos + 24]
            )
        elif tag == b"data":
            data_len = min(size, n - pos - 8)
        pos += 8 + size + (size & 1)  # RIFF chunks are u16-aligned
    block_align = channels * bits // 8
    if sample_rate <= 0 or block_align <= 0 or data_len < 0:
        return n, 0, 0, 0, 0.0, False
    duration = (data_len // block_align) / float(sample_rate)
    return n, sample_rate, channels, bits, duration, True


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """binary content -> (sample_rate, channels, bits, duration_s, ok) via
    mapInPandas — the audio member of the multimodal family. WAV parses
    dependency-free; compressed codecs (mp3/flac/ogg) need a decoder lib and
    report ok=False in this container."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_wav(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [d[0] for d in decoded],
                    "sample_rate": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "bits_per_sample": [d[3] for d in decoded],
                    "duration_s": [d[4] for d in decoded],
                    "ok": [d[5] for d in decoded],
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, AUDIO_META_SCHEMA)


def decode_image_meta(media: DataFrame) -> DataFrame:
    """binary content -> (byte_len, width, height, ok) via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "ok": [d[3] for d in decoded],
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, DECODED_META_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """binary content -> fixed-dim float features via mapInPandas.

    Stub body: md5-seeded pseudo-embedding (deterministic); a real pipeline
    runs the vision encoder here, batched per Arrow partition.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    continue
                digest = hashlib.md5(bytes(content)).digest()
                vals = [
                    int.from_bytes(digest[(2 * i) % 16 : (2 * i) % 16 + 2], "little")
                    / 65535.0
                    for i in range(dim)
                ]
                feats.append(vals)
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "content").mapInPandas(batches, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)

# deterministic fake video container (test fixture / codec-free stub):
# magic 'FVID' + u16 fps + u16 n_frames, then per frame u32le length +
# bytes. A real pipeline stores mp4/webm here and decodes with
# PyAV/ffmpeg; the frame-sampling plumbing (row EXPANSION inside Arrow
# batches, timestamps, ok-degradation) is identical either way.
_FVID_MAGIC = b"FVID"

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("timestamp_s", T.DoubleType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def pack_fake_video(fps: int, frames: "list[bytes]") -> bytes:
    """Build a fake video blob the stub frame-sampler understands."""
    out = [_FVID_MAGIC, struct.pack("<HH", fps, len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def _resize_one(
    content: bytes | None, max_side: int
) -> tuple[bytes | None, int, int, bool]:
    if content is None:
        return None, 0, 0, False
    if len(content) >= 8 and content[:4] == _FAKE_MAGIC:
        # deterministic stub transform: scale the longer side down to
        # max_side preserving aspect (floor, min 1), payload untouched —
        # the real body is PIL thumbnail/encode, same signature
        w, h = struct.unpack("<HH", content[4:8])
        if max(w, h) <= max_side:
            return content, w, h, True
        if w >= h:
            nw, nh = max_side, max(1, (h * max_side) // w)
        else:
            nw, nh = max(1, (w * max_side) // h), max_side
        return pack_fake_image(nw, nh, content[8:]), nw, nh, True
    if _PIL_IMAGE is not None:
        import io

        try:
            with _PIL_IMAGE.open(io.BytesIO(content)) as img:
                img.thumbnail((max_side, max_side))
                buf = io.BytesIO()
                img.save(buf, format=img.format or "PNG")
                return buf.getvalue(), int(img.width), int(img.height), True
        except Exception:  # noqa: BLE001 — poisoned blob -> ok=False
            return None, 0, 0, False
    return None, 0, 0, False


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Bound every image's longer side to ``max_side`` (aspect
    preserved, never upscaled) — the normalize-before-encode step of a
    vision training pipeline, as one Arrow map. PIL body when installed;
    the FAKE container resizes via its header (deterministic stub with
    the identical contract); undecodable blobs degrade to ok=False with
    null content, never raise — a poisoned blob must not kill a 100-TB
    scan."""
    if max_side < 1:
        raise ValueError("max_side must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [_resize_one(c, max_side) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [r[0] for r in resized],
                    "width": [r[1] for r in resized],
                    "height": [r[2] for r in resized],
                    "ok": [r[3] for r in resized],
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, RESIZED_SCHEMA)


def _iter_fvid_frames(content: bytes):
    fps, n = struct.unpack("<HH", content[4:8])
    pos = 8
    for i in range(n):
        if pos + 4 > len(content):
            return
        (flen,) = struct.unpack("<I", content[pos : pos + 4])
        pos += 4
        if pos + flen > len(content):
            return
        yield i, fps, content[pos : pos + flen]
        pos += flen


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every ``every_n``-th frame from video blobs — one row per
    SAMPLED FRAME (row expansion inside the Arrow batch: the shape a
    frame-level vision encoder consumes downstream). Timestamps derive
    from the container fps. The FVID stub container decodes
    dependency-free; real codecs need PyAV/ffmpeg and degrade to a
    single ok=False row per blob (provenance preserved, scan never
    dies). Frame 0 is always emitted, matching ffmpeg's
    select='not(mod(n\\,N))' convention."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames, oks = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if (
                    content is None
                    or len(content) < 8
                    or bytes(content[:4]) != _FVID_MAGIC
                ):
                    ids.append(mid)
                    idxs.append(None)
                    tss.append(None)
                    frames.append(None)
                    oks.append(False)
                    continue
                for i, fps, frame in _iter_fvid_frames(bytes(content)):
                    if i % every_n:
                        continue
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(float(i) / float(fps) if fps else None)
                    frames.append(frame)
                    oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="object"),
                    "timestamp_s": pd.Series(tss, dtype="object"),
                    "frame": frames,
                    "ok": pd.Series(oks, dtype="bool"),
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, FRAMES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media blobs (the
    synthetic corpus has no binary tables; the plumbing is identical)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("text/plain").alias("mime_type"),
        F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("source_uri"),
    )
