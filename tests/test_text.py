"""Tests for text-analysis operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_usaspending_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox and the lazy dog"),
        (2, "der Hund und die Katze ist da"),
        (3, "el gato es bueno que si"),
        (4, "xyzzy plugh qwerty"),
        (5, "Hello, world! 42 things."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(docs):
    out = {r.doc_id: r.n_tokens for r in docs.select("doc_id", text.token_count("text")).collect()}
    assert out[1] == 8 and out[4] == 3


def test_bpe_ish_token_count(docs):
    out = {
        r.doc_id: r.n_bpe_tokens
        for r in docs.select("doc_id", text.bpe_ish_token_count("text")).collect()
    }
    # "Hello , world ! 42 things ." -> 7 pieces
    assert out[5] == 7


def test_stopword_and_punct_ratio(docs):
    row = docs.filter(F.col("doc_id") == 1).select(
        text.stopword_ratio("text").alias("s"), text.punct_ratio("text").alias("p")
    ).first()
    assert abs(row.s - 3 / 8) < 1e-12  # the, and, the
    assert row.p == 0.0
    row5 = docs.filter(F.col("doc_id") == 5).select(
        text.punct_ratio("text").alias("p")
    ).first()
    assert row5.p > 0


def test_langid(docs):
    out = {r.doc_id: r.lang_pred for r in docs.select("doc_id", text.langid("text")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "  HELLO\tWORLD ")],
        "id int, text string",
    )
    fps = [r.fingerprint for r in df.select(text.fingerprint("text")).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert len(fps[0]) == 32  # md5 hex


def test_quality_columns_shape(docs):
    out = text.quality_columns(docs)
    assert {"q_n_chars", "q_n_tokens", "q_n_bpe_tokens", "q_stopword_ratio", "q_punct_ratio"} <= set(
        out.columns
    )
    assert out.count() == 5


def test_repetition_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # all dup tokens; only bigram is "a a"
            (2, "a b c d"),          # no dups; 3 distinct bigrams
            (3, "x"),                # single token: no bigrams at all
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.repetition_metrics(df).collect()}
    assert out[1].n_tokens == 4
    assert abs(out[1].dup_token_frac - 3 / 4) < 1e-12
    assert out[1].top_bigram_frac == 1.0
    assert out[2].dup_token_frac == 0.0
    assert abs(out[2].top_bigram_frac - 1 / 3) < 1e-12
    assert out[3].top_bigram_frac == 0.0  # no bigrams -> coalesced to 0


def test_pii_scrub_all_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b_c%d@sub.example.co and 555-123-4567 twice 555.123.4567"),
            (2, "ssn 123-45-6789 then ip 192.168.0.1 end"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.pii_redaction_stats(df).collect()}
    assert out[1].scrubbed == "mail <EMAIL> and <PHONE> twice <PHONE>"
    assert (out[1].n_email, out[1].n_phone) == (1, 2)
    assert out[2].scrubbed == "ssn <SSN> then ip <IP> end"
    assert (out[2].n_ssn, out[2].n_ipv4) == (1, 1)
    # SSN consumed before the phone pattern: never double-counted
    assert out[2].n_phone == 0
    assert out[3].scrubbed == "no pii here at all"
    assert (out[3].n_email, out[3].n_ssn, out[3].n_phone, out[3].n_ipv4) == (0, 0, 0, 0)


def test_chunk_documents_slicing(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): r.chunk_text
        for r in text.chunk_documents(df, chunk_tokens=3).collect()
    }
    assert got == {
        (1, 0): "a b c",
        (1, 1): "d e f",
        (1, 2): "g",        # ragged tail keeps the remainder
        (2, 0): "x y",      # short doc: one chunk
        (3, 0): "solo",
    }
    # chunking is a pure map: no exchange in the physical plan
    plan = text.chunk_documents(df, chunk_tokens=3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
