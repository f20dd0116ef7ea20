"""WARC source for web-crawl ingest — the format 100-TB text corpora
actually start from (Common Crawl ships WARC; ISO 28500 / the public
WARC 1.1 spec).

Format recap (public spec): a record is a version line (``WARC/1.0``,
CRLF), header lines (``Name: value``, CRLF), a blank line, exactly
``Content-Length`` bytes of content block, then CRLF CRLF. A
``.warc.gz`` is a sequence of INDEPENDENTLY gzipped members, one record
each (the Common Crawl convention, so records can be random-accessed
from the index); decompression walks member by member via
``zlib.unused_data``.

Distribution model: one WARC FILE is the unit of parallelism. The format
is unsplittable without an external index, and crawls ship ~1 GB files
by the tens of thousands, so FILE-level parallelism saturates any
cluster — ``spark.read.format("binaryFile")`` lists and partitions the
files (pushdown-friendly path globs), and record parsing happens
executor-side in ONE mapInPandas pass; no driver ever touches record
bytes. Whole files ride executor memory, which is the standard
trade-off for 1 GB crawl shards (Spark's own unsplittable-gzip JSONL
path makes the same one).

The parsed table is the multimodal-bytes posture (operators/multimodal):
payload stays an opaque ``binary`` column with typed metadata beside it;
``warc_responses_to_documents`` then produces the documents-table shape
for the text operators.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

WARC_DDL = (
    "warc_record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary, source_file string, record_index long"
)
_COLUMNS = [
    "warc_record_id", "warc_type", "target_uri", "warc_date",
    "content_type", "content_length", "payload", "source_file",
    "record_index",
]


def gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout).
    Plain ``gzip.decompress`` handles this too, but walking
    ``unused_data`` keeps memory to one member at a time plus output."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
        except zlib.error as exc:
            raise ValueError("trailing non-gzip bytes in .warc.gz") from exc
        out.append(d.flush())
        if not d.eof:
            # decompress/flush return partial output without error when the
            # stream ends mid-member; without this check a truncated shard
            # silently drops tail records whenever the cut lands on a record
            # boundary in the decompressed bytes.
            raise ValueError("truncated gzip member in .warc.gz")
        data = d.unused_data
    return b"".join(out)


def iter_warc_records(data: bytes) -> "Iterator[tuple[dict, bytes]]":
    """Yield ``(headers, content_block)`` per record from raw WARC bytes.
    Headers are lower-cased names -> stripped values (header names are
    case-insensitive per spec); a legally REPEATED header (e.g.
    WARC-Concurrent-To) is collapsed last-wins — lossless for every field
    this source projects, lossy for consumers that want the full list.
    Strict: a malformed version line or a
    truncated content block raises ValueError with the byte offset —
    quarantine belongs at the FILE level (a corrupt member), not the
    record level, because after a framing error every later offset is
    untrustworthy."""
    pos, n = 0, len(data)
    while True:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        eol = data.find(b"\r\n", pos)
        if eol < 0 or not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC version line at byte {pos}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError(f"unterminated header block at byte {pos}")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed header line at byte {pos}")
            headers[name.strip().lower().decode("ascii")] = value.strip().decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"missing/bad Content-Length at byte {pos}") from exc
        if pos + clen > n:
            raise ValueError(f"truncated content block at byte {pos}")
        yield headers, data[pos : pos + clen]
        pos += clen


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WARC.GZ files under ``path`` into one row per record:
    ``(warc_record_id, warc_type, target_uri, warc_date, content_type,
    content_length, payload binary, source_file, record_index)`` —
    record_index is the record's ordinal within its file, a stable
    provenance key even for records missing WARC-Record-ID. File listing
    and partitioning via binaryFile (path globs push down); parsing is one
    executor-side Arrow pass."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    schema = StructType.fromDDL(WARC_DDL)

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fpath.endswith(".gz"):
                    data = gunzip_members(data)
                for idx, (h, payload) in enumerate(iter_warc_records(data)):
                    rows.append(
                        (
                            h.get("warc-record-id"),
                            h.get("warc-type"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            h.get("content-type"),
                            len(payload),
                            payload,
                            fpath,
                            idx,
                        )
                    )
            yield pd.DataFrame(rows, columns=_COLUMNS)

    return files.mapInPandas(parse, schema)


def http_body(payload: bytes) -> bytes:
    """Split an HTTP response message (the content block of a WARC
    ``response`` record) at the first CRLF CRLF and return the body; a
    block with no header terminator is returned whole (some crawlers
    store bare bodies)."""
    idx = payload.find(b"\r\n\r\n")
    return payload if idx < 0 else payload[idx + 4 :]


def warc_responses_to_documents(
    warc: DataFrame, source: str = "warc"
) -> DataFrame:
    """Project WARC ``response`` records onto the documents-table shape
    (FIXTURES.md §B): body text (UTF-8, lossy decode), stable 63-bit id
    from the record id — records missing WARC-Record-ID fall back to
    hashing ``source_file#record_index`` (unique per record by
    construction) so id-less responses never collapse to one doc_id and
    get silently merged by exact dedup. One more Arrow map — no shuffle;
    downstream text operators take it from here."""
    resp = warc.filter(F.col("warc_type") == "response")
    schema = StructType.fromDDL(
        "doc_id long, text string, source string, target_uri string"
    )

    def to_docs(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import hashlib

        for pdf in batches:
            ids, texts, uris = [], [], []
            for rid, payload, uri, sfile, ridx in zip(
                pdf["warc_record_id"], pdf["payload"], pdf["target_uri"],
                pdf["source_file"], pdf["record_index"],
            ):
                key = rid if rid else f"{sfile}#{ridx}"
                digest = hashlib.sha256(key.encode()).digest()
                ids.append(int.from_bytes(digest[:8], "big") >> 1)
                texts.append(http_body(bytes(payload)).decode("utf-8", "replace"))
                uris.append(uri)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "text": texts,
                    "source": [source] * len(ids),
                    "target_uri": uris,
                }
            )

    return resp.mapInPandas(to_docs, schema)
