"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (SURVEY.md §7.4 extension).

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas`` so each partition is processed as
columnar batches (the only sane shape at 100 TB — per-row Python UDFs are
10-100x slower).

The actual codec calls are STUBBED (this container has no image/audio
libraries): ``decode_image_meta`` parses a deterministic fake header and
``extract_features`` hashes bytes into a fixed-dim pseudo-embedding. The
Spark-side contracts — schemas, batch iteration, partitioning, column
pruning — are real and tested; swapping in PIL/ffmpeg later only changes the
body of the pandas functions.
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


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media blobs (the
    synthetic corpus has no binary tables; the plumbing is identical)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("text/plain").alias("mime_type"),
        F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("source_uri"),
    )
