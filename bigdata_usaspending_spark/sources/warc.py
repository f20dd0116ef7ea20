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


# --------------------------------------------------------------------------
# URL canonicalization + URL-level dedup (crawl tier 1)
# --------------------------------------------------------------------------

# Tracking parameters stripped during canonicalization: the utm_* family
# plus the common click-id params. Matched against a "name=value" (or bare
# "name") query segment. The pattern stays inside the Java-regex ∩ RE2
# common subset (no lookaround) so it replays identically in any engine.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid)(=|$)"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonicalize_url(col: "Column | str", alias: str = "canonical_url") -> "Column":
    """Canonical form of a URL — the standard FIRST dedup tier of a crawl
    pipeline (dedup by URL before ever touching document text; the
    reference has no crawl surface, this extends SURVEY §7.4):

    - scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization);
    - fragment dropped (never sent to the server);
    - default ports removed (``:80`` for http, ``:443`` for https);
    - trailing slashes stripped from the path (``/a/`` == ``/a``, ``/``
      == empty path);
    - tracking parameters removed (``TRACKING_PARAM_RE``: utm_*, fbclid,
      gclid, msclkid, mc_eid, igshid) and the surviving query segments
      sorted bytewise, so param order never splits a dedup group;
    - userinfo is preserved VERBATIM ahead of the case-folded host
      (``User@Host.COM`` -> ``User@host.com``); percent-encoding case
      and ``www.`` are left untouched (conservative: never merges URLs
      that could be distinct resources).

    Strings without a ``scheme://`` are passed through trimmed (relative
    links and junk rows dedup on themselves rather than erroring). Pure
    Column expression — whole-stage codegen, no UDF — built from
    regexp/split/filter/sort primitives every engine shares, so the
    canonicalization is oracle-replayable (plans/corpus_r10.q_url_dedup).
    """
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathquery = F.substr(rest, F.length(authority) + 1)
    # userinfo ("user:pw@") rides verbatim; host/port parse AFTER it —
    # '^([^:]*)' over the raw authority would otherwise take "user" as
    # the host and drop the real one
    userinfo = F.regexp_extract(authority, r"^([^@]*@)", 1)
    hostport = F.regexp_replace(authority, r"^[^@]*@", "")
    # bracketed IPv6 authorities ([2001:db8::1]:8080) carry colons inside
    # the host — '^([^:]*)' would truncate at the first one and MERGE
    # distinct addresses. Extract a well-formed bracket group whole (hex
    # case-folds like any host, RFC 4007/5952); a malformed bracket
    # authority (unclosed '[') passes through verbatim with no port split
    # so distinct junk never collapses to one group.
    bhost = F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1)
    is_bracket = F.substring(hostport, 1, 1) == "["
    host = (
        F.when(~is_bracket, F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)))
        .when(bhost != "", F.lower(bhost))
        .otherwise(hostport)
    )
    port = (
        F.when(~is_bracket, F.regexp_extract(hostport, r":([0-9]+)$", 1))
        .when(bhost != "", F.regexp_extract(hostport, r"^\[[^\]]*\]:([0-9]+)$", 1))
        .otherwise(F.lit(""))
    )
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    portpart = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(pathquery, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.when(
        pathquery.contains("?"),
        F.regexp_replace(pathquery, r"^[^?]*\?", ""),
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qpart = F.when(
        F.size(kept) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), userinfo, host, portpart, path, qpart)
    return F.when(scheme == "", u).otherwise(canon).alias(alias)


def url_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "target_uri"
) -> DataFrame:
    """One row per distinct canonical URL: ``(canonical_url, id_col,
    n_copies)`` with the canonical (min) id — the URL-level twin of
    ``dedup.exact_dedup_groups``. Null URLs are dropped (no URL, no URL
    identity; text-level dedup downstream still sees those rows via
    ``url_dedup``). Single shuffle keyed on the canonical URL string —
    URLs are bounded-small, and canonicalization runs map-side inside
    codegen, so this costs one linear pass at 100 TB."""
    return (
        df.filter(F.col(url_col).isNotNull())
        .select(F.col(id_col), canonicalize_url(url_col))
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def url_dedup(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "target_uri"
) -> DataFrame:
    """Keep one (min-id) row per distinct canonical URL; rows with a null
    URL always survive (they carry no URL identity — the text tiers
    downstream dedup them). Semi-join on the id, same shape as
    ``dedup.exact_dedup``."""
    keep = url_dedup_groups(df, id_col, url_col).select(id_col)
    return df.join(keep, on=id_col, how="semi").unionByName(
        df.filter(F.col(url_col).isNull())
    )


def host_of(col: "Column | str", alias: str = "host") -> "Column":
    """Lowercased registered host of a URL (port and userinfo stripped) —
    the grouping key for host-level crawl hygiene: per-host profiles,
    blocklist gates (the C4/RefinedWeb "blocked domains" tier), and
    politeness accounting. Strings without ``scheme://`` yield ''.
    Pure codegen (two regexp_extracts), same engine-portable regex
    subset as canonicalize_url."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    authority = F.regexp_extract(u, _SCHEME_RE + r"([^/?#]*)", 2)
    no_user = F.regexp_replace(authority, r"^[^@]*@", "")
    # same bracketed-IPv6 handling as canonicalize_url: a well-formed
    # '[...]' group is the host whole; malformed bracket authorities pass
    # verbatim so distinct hosts never share a group/blocklist key
    bhost = F.regexp_extract(no_user, r"^(\[[^\]]*\])", 1)
    host = (
        F.when(
            F.substring(no_user, 1, 1) != "[",
            F.lower(F.regexp_extract(no_user, r"^([^:]*)", 1)),
        )
        .when(bhost != "", F.lower(bhost))
        .otherwise(no_user)
    )
    return host.alias(alias)


def url_index(df: DataFrame, url_col: str = "target_uri") -> DataFrame:
    """The crawl's distinct canonical-URL set — the persistent URL-tier
    index an incremental pipeline maintains (write it partitioned/bucketed
    by ``canonical_url`` so batch probes co-locate). The URL twin of
    ``dedup.fingerprint_index``."""
    return (
        df.filter(F.col(url_col).isNotNull())
        .select(canonicalize_url(url_col))
        .distinct()
    )


def url_dedup_against_index(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "target_uri",
    broadcast_batch: bool = True,
) -> DataFrame:
    """Incremental URL dedup: survivors of a NEW crawl increment against
    an existing ``url_index``. At 100 TB you never re-dedup the whole
    crawl per ingest — drop batch rows whose canonical URL the index has
    already seen, then min-id dedup the batch's own URL collisions. Union
    the survivors' canonical URLs back into the index afterwards.

    Join strategy is ``dedup.dedup_against_index``'s probe inversion
    verbatim: with ``broadcast_batch=True`` (default) the crawl-sized
    index is only ever SCANNED — the batch's distinct canonical-URL set
    broadcasts into a semi-join over the index, the (batch-bounded) hit
    set broadcasts back for the anti-join, and no index-side Exchange
    exists in the plan. Rows with a null URL always survive (no URL
    identity — the text tiers own them)."""
    keyed = batch.filter(F.col(url_col).isNotNull()).select(
        F.col(id_col), canonicalize_url(url_col)
    )
    if broadcast_batch:
        batch_urls = keyed.select("canonical_url").distinct()
        hits = index.join(
            F.broadcast(batch_urls), on="canonical_url", how="semi"
        )
        fresh = keyed.join(F.broadcast(hits), on="canonical_url", how="anti")
    else:
        fresh = keyed.join(index, on="canonical_url", how="anti")
    keep = (
        fresh.groupBy("canonical_url")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return batch.join(keep, on=id_col, how="semi").unionByName(
        batch.filter(F.col(url_col).isNull())
    )


def warc_host_profile(warc: DataFrame) -> DataFrame:
    """Per-host crawl accounting over raw WARC records — the politeness /
    coverage view a crawl operator reads before rebalancing a frontier:
    fetch counts, payload bytes, distinct canonical URLs, the fetch-time
    span, and the observed request rate (fetches per second across the
    span; 0.0 for single-fetch hosts). One aggregate pass keyed on the
    host; WARC-Date parses with try_to_timestamp (malformed dates yield
    null and drop out of the span/rate, never error — ANSI-safe). WARC
    1.1 permits fractional seconds (2023-01-01T00:00:00.123Z) — those
    parse via a second leg that trims the fraction first (any digit
    count), so sub-second crawls report real spans/rates instead of
    silently all-null timestamps."""
    resp = warc.filter(F.col("warc_type") == "response")
    whole = F.try_to_timestamp(
        F.col("warc_date"), F.lit("yyyy-MM-dd'T'HH:mm:ssX")
    )
    ts = F.coalesce(
        whole,
        F.try_to_timestamp(
            F.regexp_replace(F.col("warc_date"), r"\.[0-9]+", ""),
            F.lit("yyyy-MM-dd'T'HH:mm:ssX"),
        ),
    )
    rows = resp.select(
        host_of("target_uri"),
        F.col("content_length"),
        canonicalize_url("target_uri"),
        ts.alias("_ts"),
    )
    span = (
        F.unix_timestamp(F.max("_ts")) - F.unix_timestamp(F.min("_ts"))
    ).cast("double")
    return rows.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.sum("content_length").cast("long").alias("payload_bytes"),
        F.count_distinct("canonical_url").alias("n_urls"),
        F.min("_ts").alias("first_fetch"),
        F.max("_ts").alias("last_fetch"),
        # rate numerator counts only DATED fetches (count of _ts skips
        # nulls) so malformed dates drop out of the rate, not just the
        # span — otherwise 10 fetches with 2 parseable dates 1 s apart
        # would report 10 fetches/s
        F.when(span > 0, F.count("_ts").cast("double") / span)
        .otherwise(F.lit(0.0))
        .alias("fetches_per_sec"),
    )
