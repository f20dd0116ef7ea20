"""Tests for the WARC source (sources/warc)."""

from __future__ import annotations

import gzip

import pytest

from bigdata_usaspending_spark.sources import warc as W


def _record(rtype: str, rid: str, uri: str | None, payload: bytes) -> bytes:
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: 2024-01-01T00:00:00Z",
    ]
    if uri:
        headers.append(b"WARC-Target-URI: " + uri.encode())
    headers.append(b"Content-Type: application/http; msgtype=response")
    headers.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


HTTP1 = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhello warc world"
HTTP2 = b"HTTP/1.1 200 OK\r\n\r\nsecond page body"
INFO = b"software: test-crawler 1.0\r\n"


def _warc_bytes() -> bytes:
    return (
        _record("warcinfo", "<urn:uuid:0>", None, INFO)
        + _record("response", "<urn:uuid:1>", "http://a.example/", HTTP1)
        + _record("response", "<urn:uuid:2>", "http://b.example/", HTTP2)
    )


def test_iter_warc_records_and_strictness():
    recs = list(W.iter_warc_records(_warc_bytes()))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "response", "response",
    ]
    assert recs[1][1] == HTTP1 and recs[2][1] == HTTP2
    assert recs[1][0]["warc-target-uri"] == "http://a.example/"

    with pytest.raises(ValueError, match="version line"):
        list(W.iter_warc_records(b"NOT-WARC\r\n\r\n"))
    truncated = _record("response", "<urn:uuid:9>", "http://x/", HTTP1)[:-20]
    with pytest.raises(ValueError, match="truncated"):
        list(W.iter_warc_records(truncated))
    noclen = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        list(W.iter_warc_records(noclen))


def test_gunzip_members_roundtrip():
    members = b"".join(
        gzip.compress(_record("response", f"<urn:uuid:{i}>", "http://x/", HTTP2))
        for i in range(3)
    )
    data = W.gunzip_members(members)
    assert len(list(W.iter_warc_records(data))) == 3
    with pytest.raises(ValueError, match="non-gzip"):
        W.gunzip_members(gzip.compress(b"x") + b"JUNK")


def test_gunzip_members_rejects_truncated_member():
    """A shard cut mid-member must raise, not silently return the partial
    decompressed prefix (which could drop tail records undetected when the
    cut lands on a record boundary)."""
    whole = gzip.compress(_record("response", "<urn:uuid:t>", "http://x/", HTTP1))
    assert W.gunzip_members(whole)  # intact member decompresses fine
    with pytest.raises(ValueError, match="truncated gzip member"):
        W.gunzip_members(whole[:-8])
    # truncated FINAL member after intact leading members
    with pytest.raises(ValueError, match="truncated gzip member"):
        W.gunzip_members(whole + whole[:-8])


def test_read_warc_plain_and_gz(spark, tmp_path):
    """One row per record across a plain shard and a member-gzipped
    shard; payload bytes round-trip exactly; file-level parallelism."""
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "shard0.warc").write_bytes(_warc_bytes())
    (d / "shard1.warc.gz").write_bytes(
        b"".join(
            gzip.compress(r)
            for r in (
                _record("warcinfo", "<urn:uuid:g0>", None, INFO),
                _record("response", "<urn:uuid:g1>", "http://c.example/", HTTP1),
            )
        )
    )
    df = W.read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 5
    by_id = {r.warc_record_id: r for r in rows}
    assert bytes(by_id["<urn:uuid:1>"].payload) == HTTP1
    assert bytes(by_id["<urn:uuid:g1>"].payload) == HTTP1
    assert by_id["<urn:uuid:g1>"].source_file.endswith("shard1.warc.gz")
    assert by_id["<urn:uuid:2>"].content_length == len(HTTP2)
    # the parse is a pure map: no exchange in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan


def test_warc_responses_to_documents(spark, tmp_path):
    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "s.warc").write_bytes(_warc_bytes())
    docs = W.warc_responses_to_documents(W.read_warc(spark, str(d)))
    rows = {r.target_uri: r for r in docs.collect()}
    assert set(rows) == {"http://a.example/", "http://b.example/"}
    assert rows["http://a.example/"].text == "hello warc world"
    assert rows["http://b.example/"].text == "second page body"
    ids = [r.doc_id for r in rows.values()]
    assert all(i >= 0 for i in ids) and len(set(ids)) == 2
    # warcinfo records are excluded; documents flow into text operators
    from bigdata_usaspending_spark.operators import text

    toks = docs.select("doc_id", text.token_count("text")).collect()
    assert {t.n_tokens for t in toks} == {3}


def test_idless_responses_get_distinct_doc_ids(spark, tmp_path):
    """Responses missing WARC-Record-ID fall back to source_file#record_index
    — two id-less pages must NOT collapse to one doc_id (exact dedup would
    silently merge distinct pages)."""

    def _record_no_id(uri: str, payload: bytes) -> bytes:
        headers = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Target-URI: " + uri.encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"

    d = tmp_path / "crawl3"
    d.mkdir()
    (d / "s.warc").write_bytes(
        _record_no_id("http://p1/", HTTP1) + _record_no_id("http://p2/", HTTP2)
    )
    raw = W.read_warc(spark, str(d))
    assert [r.record_index for r in raw.orderBy("record_index").collect()] == [0, 1]
    docs = W.warc_responses_to_documents(raw).collect()
    assert len(docs) == 2
    assert len({r.doc_id for r in docs}) == 2
    # and the fallback is deterministic: re-reading yields the same ids
    docs2 = W.warc_responses_to_documents(W.read_warc(spark, str(d))).collect()
    assert {r.doc_id for r in docs} == {r.doc_id for r in docs2}


def test_warc_to_curated_corpus_end_to_end(spark, tmp_path):
    """Crawl ingest to curated corpus in one flow: WARC shards ->
    documents projection -> quality + language-ID + exact dedup — the
    front half of the training-data pipeline running on crawl bytes
    instead of fixture parquet."""
    import gzip as _gzip

    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.operators import dedup, text

    body_en = b"HTTP/1.1 200 OK\r\n\r\nthe quick fox and the lazy dog"
    body_de = b"HTTP/1.1 200 OK\r\n\r\nder hund und die katze ist da"
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(
        _record("response", "<urn:uuid:1>", "http://en.example/", body_en)
        + _record("response", "<urn:uuid:2>", "http://de.example/", body_de)
    )
    # a second shard duplicating the english page under a new record id
    (d / "b.warc.gz").write_bytes(
        _gzip.compress(
            _record("response", "<urn:uuid:3>", "http://mirror.example/", body_en)
        )
    )
    docs = W.warc_responses_to_documents(W.read_warc(spark, str(d)))
    curated = (
        docs.withColumn("lang_pred", text.langid("text"))
        .withColumn("n_tokens", text.token_count("text"))
    )
    rows = {r.target_uri: r for r in curated.collect()}
    assert rows["http://en.example/"].lang_pred == "en"
    assert rows["http://de.example/"].lang_pred == "de"
    assert rows["http://en.example/"].n_tokens == 7

    # exact dedup collapses the mirrored page across shards
    survivors = dedup.exact_dedup(curated, "doc_id", text_col="text")
    kept = survivors.select("text").collect()
    assert survivors.count() == 2
    assert {r.text for r in kept} == {
        "the quick fox and the lazy dog",
        "der hund und die katze ist da",
    }


def test_warc_framing_is_length_based_not_delimiter_based():
    """Payloads containing CRLF runs, 'WARC/1.0' lines, or header-shaped
    bytes must round-trip exactly: framing follows Content-Length, never
    content sniffing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    adversarial = st.lists(
        st.one_of(
            st.binary(min_size=0, max_size=12),
            st.sampled_from(
                [b"\r\n\r\n", b"WARC/1.0\r\n", b"Content-Length: 0\r\n\r\n"]
            ),
        ),
        min_size=0,
        max_size=6,
    ).map(b"".join)

    @given(payloads=st.lists(adversarial, min_size=1, max_size=4))
    @settings(max_examples=50, deadline=None)
    def check(payloads):
        blob = b"".join(
            _record("response", f"<urn:uuid:{i}>", "http://x/", p)
            for i, p in enumerate(payloads)
        )
        recs = list(W.iter_warc_records(blob))
        assert [p for _, p in recs] == payloads
        assert [h["warc-record-id"] for h, _ in recs] == [
            f"<urn:uuid:{i}>" for i in range(len(payloads))
        ]

    check()


# --------------------------------------------------------------------------
# URL canonicalization + URL dedup (crawl tier 1)
# --------------------------------------------------------------------------

CANON_CASES = [
    # scheme/host case-fold, default port, trailing slash, tracker, fragment
    ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&id=5#frag",
     "http://www.example.com/a/b?id=5"),
    ("http://www.example.com/a/b?id=5", "http://www.example.com/a/b?id=5"),
    # https default port + root path collapse
    ("https://Example.com:443/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    # non-default port kept
    ("http://example.com:8080/x/", "http://example.com:8080/x"),
    # tracker stripped, params sorted bytewise
    ("http://example.com/x?b=2&a=1&fbclid=abc", "http://example.com/x?a=1&b=2"),
    # tracking-only query -> no '?'
    ("http://example.com/x?utm_campaign=z", "http://example.com/x"),
    # bare tracker name without '=' also stripped
    ("http://example.com/x?gclid&a=1", "http://example.com/x?a=1"),
    # non-tracking param whose name merely CONTAINS a tracker is kept
    ("http://example.com/x?myutm_source=1", "http://example.com/x?myutm_source=1"),
    # no scheme: passthrough, trimmed, fragment still dropped
    ("  /relative/path#sec  ", "/relative/path"),
    ("not a url", "not a url"),
    # other schemes: normalized but ports untouched
    ("FTP://Host.Com:21/file", "ftp://host.com:21/file"),
    # userinfo rides verbatim; the REAL host behind it case-folds and the
    # default port still strips (the round-10 review fix: '^([^:]*)' over
    # the raw authority used to take "User" as the host)
    ("http://User:Pw@WWW.Example.COM:80/a", "http://User:Pw@www.example.com/a"),
    ("https://tok@Example.com:8443/b", "https://tok@example.com:8443/b"),
    # bracketed IPv6 (the round-11 ADVICE fix): the whole [..] group is
    # the host — case-folds, default port strips, non-default port kept,
    # and DISTINCT addresses never truncate to the same prefix
    ("http://[2001:DB8::1]:80/x/", "http://[2001:db8::1]/x"),
    ("https://[2001:db8::1]:8443/x", "https://[2001:db8::1]:8443/x"),
    ("http://[2001:db8::1]/x", "http://[2001:db8::1]/x"),
    ("http://[2001:db8::2]/x", "http://[2001:db8::2]/x"),
    ("http://u@[2001:DB8::1]:80/x", "http://u@[2001:db8::1]/x"),
    # malformed bracket authority (unclosed '['): verbatim passthrough,
    # no port split, no case fold — distinct junk never merges
    ("http://[2001:db8/x", "http://[2001:db8/x"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)], ["i", "u"]
    ).select("i", W.canonicalize_url("u"))
    got = {r.i: r.canonical_url for r in df.collect()}
    for i, (raw, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonicalize_url_is_idempotent(spark):
    df = spark.createDataFrame(
        [(raw,) for raw, _ in CANON_CASES], ["u"]
    ).select(W.canonicalize_url("u").alias("c1"))
    df = df.select("c1", W.canonicalize_url("c1").alias("c2"))
    for r in df.collect():
        assert r.c1 == r.c2


def test_url_dedup_groups_and_survivors(spark):
    rows = [
        (1, "HTTP://A.example:80/p/?utm_source=x"),  # canon http://a.example/p
        (2, "http://a.example/p"),                    # duplicate of 1
        (3, "https://a.example/p"),                   # distinct (scheme)
        (4, None),                                    # null URL: always survives
        (5, "http://a.example/p?x=1"),                # distinct (param)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "target_uri"])
    groups = {
        r.canonical_url: (r.doc_id, r.n_copies)
        for r in W.url_dedup_groups(df).collect()
    }
    assert groups["http://a.example/p"] == (1, 2)
    assert groups["https://a.example/p"] == (3, 1)
    assert groups["http://a.example/p?x=1"] == (5, 1)
    survivors = sorted(r.doc_id for r in W.url_dedup(df).collect())
    assert survivors == [1, 3, 4, 5]


def test_host_of(spark):
    cases = [
        ("HTTP://User:pw@WWW.Example.COM:8080/a?b#c", "www.example.com"),
        ("https://site.org", "site.org"),
        ("ftp://Host.Com:21/x", "host.com"),
        ("not a url", ""),
        ("http://a.b.c/path", "a.b.c"),
        # bracketed IPv6: whole [..] group, port stripped, hex case-folds
        ("http://[2001:DB8::1]:8080/x", "[2001:db8::1]"),
        ("http://u@[2001:db8::1]/x", "[2001:db8::1]"),
        # malformed bracket: verbatim, never truncated at a colon
        ("http://[2001:db8", "[2001:db8"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], ["i", "u"]
    ).select("i", W.host_of("u"))
    got = {r.i: r.host for r in df.collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_url_dedup_against_index(spark):
    """Incremental URL tier: index hits drop, in-batch URL collisions keep
    the min id, null-URL rows always survive, and the index side is never
    shuffled (the dedup_against_index probe-inversion plan)."""
    corpus = spark.createDataFrame(
        [(100, "http://a.example/seen"), (101, "http://a.example/also-seen")],
        ["doc_id", "target_uri"],
    )
    index = W.url_index(corpus)
    batch = spark.createDataFrame(
        [
            (1, "HTTP://A.Example:80/seen?utm_source=x"),  # index hit
            (2, "http://a.example/new"),                    # fresh
            (3, "http://a.example/new/"),                   # in-batch dup of 2
            (4, None),                                      # null URL survives
        ],
        ["doc_id", "target_uri"],
    )
    got = sorted(r.doc_id for r in W.url_dedup_against_index(batch, index).collect())
    assert got == [2, 4]

    # the probe inversion's two broadcast joins (index SEMI
    # broadcast(batch urls), batch ANTI broadcast(hits)) — the final
    # batch⋈keep semi join's strategy is size-estimate-dependent on these
    # in-memory frames and is not the property under test (the parquet
    # variant is pinned by test_plans for the fingerprint twin)
    plan = (
        W.url_dedup_against_index(batch, index)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2

    # refreshing the index with the survivors' URLs makes re-probing the
    # same batch return only the null-URL row
    new_index = index.union(
        W.url_index(W.url_dedup_against_index(batch, index))
    ).distinct()
    again = sorted(
        r.doc_id for r in W.url_dedup_against_index(batch, new_index).collect()
    )
    assert again == [4]


def test_warc_host_profile(spark, tmp_path):
    """Per-host politeness accounting: fetch counts, distinct canonical
    URLs (noise variants collapse), time span and request rate."""
    recs = []
    for i, (uri, date) in enumerate([
        ("http://a.example/p?utm_source=x", "2024-01-01T00:00:00Z"),
        ("HTTP://A.Example:80/p",           "2024-01-01T00:00:10Z"),
        ("http://a.example/q",              "2024-01-01T00:00:20Z"),
        # WARC 1.1 fractional seconds must parse (round-11 ADVICE fix),
        # not silently null out of the span/rate
        ("http://a.example/r",              "2024-01-01T00:00:30.500Z"),
        ("http://b.example/only",           "2024-01-01T00:00:00Z"),
    ]):
        body = b"HTTP/1.1 200 OK\r\n\r\nbody %d" % i
        headers = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Record-ID: <urn:uuid:h%d>" % i,
            b"WARC-Date: " + date.encode(),
            b"WARC-Target-URI: " + uri.encode(),
            b"Content-Length: " + str(len(body)).encode(),
        ]
        recs.append(b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n")
    d = tmp_path / "hp"
    d.mkdir()
    (d / "s.warc").write_bytes(b"".join(recs))
    prof = {r.host: r for r in W.warc_host_profile(W.read_warc(spark, str(d))).collect()}
    a = prof["a.example"]
    assert a.n_fetches == 4 and a.n_urls == 3  # the two /p variants collapse
    # span 00:00:00 -> 00:00:30 (fraction truncated to the second)
    assert abs(a.fetches_per_sec - 4 / 30) < 1e-12
    b = prof["b.example"]
    assert b.n_fetches == 1 and b.fetches_per_sec == 0.0
