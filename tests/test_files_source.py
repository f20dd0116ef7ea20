"""JSONL/CSV file-source contract: explicit schema, malformed-row
quarantine, documents-table ingest, round-trip."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from bigdata_usaspending_spark.sources import files


def _write(path: str, lines: list[str]) -> None:
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_jsonl_quarantines_malformed(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    _write(
        p,
        [
            '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}',
            "this line is not json at all",
            '{"doc_id": 2, "text": "zwei", "lang": "de", "source": "web"}',
        ],
    )
    raw = files.read_jsonl(spark, p, files.DOCUMENTS_DDL)
    clean, bad = files.split_quarantine(raw)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    assert [r[files.CORRUPT_COL] for r in bad.collect()] == [
        "this line is not json at all"
    ]
    # DROPMALFORMED path: no corrupt column, bad line silently skipped
    dropped = files.read_jsonl(spark, p, files.DOCUMENTS_DDL, drop_malformed=True)
    assert files.CORRUPT_COL not in dropped.columns
    assert dropped.count() == 2


def test_jsonl_documents_derives_n_chars(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    _write(
        p,
        [
            '{"doc_id": 1, "text": "abc", "lang": "en", "source": "web"}',
            '{"doc_id": 2, "text": "abcdef", "lang": "en", "source": "web", "n_chars": 99}',
        ],
    )
    got = {r.doc_id: r.n_chars for r in files.jsonl_documents(spark, p).collect()}
    assert got == {1: 3, 2: 99}  # derived when absent, preserved when present


def test_read_jsonl_gzip(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl.gz")
    with gzip.open(p, "wt") as f:
        f.write('{"doc_id": 7, "text": "gz", "lang": "en", "source": "web", "n_chars": 2}\n')
    out = files.jsonl_documents(spark, p).collect()
    assert [r.doc_id for r in out] == [7]


def test_read_csv_schema_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    _write(
        p,
        [
            "k,v",
            "1,alpha",
            "not_a_number,beta",   # k fails the long cast -> quarantined
            "3,gamma",
        ],
    )
    raw = files.read_csv(spark, p, "k long, v string")
    clean, bad = files.split_quarantine(raw)
    assert {r.k: r.v for r in clean.collect()} == {1: "alpha", 3: "gamma"}
    assert bad.count() == 1


def test_jsonl_round_trip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "one", "en", "web", 3), (2, "two", "en", "book", 3)],
        files.DOCUMENTS_DDL,
    )
    out_dir = str(tmp_path / "out")
    files.write_jsonl(src, out_dir)
    assert any(f.endswith(".json") for f in os.listdir(out_dir))
    back = files.jsonl_documents(spark, out_dir)
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [
        (1, "one"),
        (2, "two"),
    ]


def test_orc_round_trip_preserves_pushdown(spark, tmp_path, sf_small):
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.catalog import load
    from bigdata_usaspending_spark.sources import files

    orders = load(spark, sf_small, "orders")
    path = str(tmp_path / "orders_orc")
    files.write_orc(orders, path)
    back = files.read_orc(spark, path)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    # the filter must reach the ORC scan (stride-stats pruning), mirroring
    # the parquet plan audits
    plan = (
        back.filter(F.col("o_totalprice") > 100.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan
