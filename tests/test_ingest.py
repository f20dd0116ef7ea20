"""Ingest tests (SURVEY.md §5.5): mocked paginated API — pagination,
malformed dates/amounts -> null, retry paths, throttle, audit row.
Mock pattern mirrors the reference's own test (tests/test_ml_app.py:48-96)."""

from __future__ import annotations

import pytest

from bigdata_usaspending_spark.sources.ingest import coerce_awards, ingest, rows_to_raw_df
from bigdata_usaspending_spark.sources.usaspending_api import UsaspendingClient
from bigdata_usaspending_spark.sources.geocoder import build_geo_dim


def _row(i: int, **overrides):
    # the reference's canonical mock record (tests/test_ml_app.py:53-75)
    base = {
        "Award ID": str(i),
        "Recipient Name": "Test Recipient",
        "Start Date": "2023-12-01",
        "End Date": "2023-12-21",
        "Award Amount": "100000.00",
        "Awarding Agency": "Test Agency",
        "Awarding Sub Agency": "Test Sub Agency",
        "Contract Award Type": "Test Type",
        "Funding Agency": "Test Funding Agency",
        "Funding Sub Agency": "Test Sub Agency",
        "Description": "Test Description",
        "Last Modified Date": "2023-12-01",
        "Base Obligation Date": "2023-12-01",
    }
    base.update(overrides)
    return base


def fake_transport_pages(pages: list[list[dict]], fail_first: int = 0):
    calls = {"n": 0, "payloads": []}

    def transport(url: str, payload: dict, timeout: float) -> dict:
        calls["payloads"].append(payload)
        if calls["n"] < fail_first:
            calls["n"] += 1
            raise TimeoutError("simulated timeout")
        page = payload["page"]
        rows = pages[page - 1] if page <= len(pages) else []
        return {
            "results": rows,
            "page_metadata": {"hasNext": page < len(pages)},
        }

    return transport, calls


def test_pagination_and_payload_shape():
    pages = [[_row(i) for i in range(3)], [_row(i) for i in range(3, 5)]]
    transport, calls = fake_transport_pages(pages)
    client = UsaspendingClient(
        "2023-01-01", "2023-12-31", transport=transport, sleep=lambda s: None
    )
    got = list(client.pages())
    assert [len(p) for p in got] == [3, 2]
    payload = calls["payloads"][0]
    # reference payload semantics (app/ml_app.py:417-442)
    assert payload["filters"]["award_type_codes"] == ["A", "B", "C"]
    assert payload["filters"]["time_period"] == [
        {"start_date": "2023-01-01", "end_date": "2023-12-31"}
    ]
    assert payload["limit"] == 100 and len(payload["fields"]) == 13


def test_retry_then_success():
    pages = [[_row(1)]]
    transport, _ = fake_transport_pages(pages, fail_first=2)
    slept = []
    client = UsaspendingClient(
        "2023-01-01", "2023-12-31", transport=transport, sleep=slept.append
    )
    assert [len(p) for p in client.pages()] == [1]
    assert slept.count(3.0) == 2  # two retry backoffs (app/ml_app.py:522-531)


def test_retry_exhaustion():
    transport, _ = fake_transport_pages([[_row(1)]], fail_first=99)
    client = UsaspendingClient(
        "2023-01-01", "2023-12-31", transport=transport, sleep=lambda s: None
    )
    with pytest.raises(TimeoutError):
        list(client.pages())


def test_empty_results_with_hasnext_true_terminates():
    # a server bug the reference actually hit: empty page + hasNext=true
    # must end the ingest, not loop forever (app/ml_app.py:454-455)
    calls = {"n": 0}

    def transport(url, payload, timeout):
        calls["n"] += 1
        rows = [_row(1)] if payload["page"] == 1 else []
        return {"results": rows, "page_metadata": {"hasNext": True}}

    client = UsaspendingClient(
        "2023-01-01", "2023-12-31", transport=transport, sleep=lambda s: None
    )
    assert [len(p) for p in client.pages()] == [1]
    assert calls["n"] == 2  # stopped right after the empty page


def test_http_client_error_not_retried():
    # 4xx means the request itself is bad — the reference aborted instead of
    # retrying (app/ml_app.py:552-555)
    import urllib.error

    calls = {"n": 0}

    def transport(url, payload, timeout):
        calls["n"] += 1
        raise urllib.error.HTTPError(url, 400, "Bad Request", None, None)

    client = UsaspendingClient(
        "2023-01-01", "2023-12-31", transport=transport, sleep=lambda s: None
    )
    with pytest.raises(urllib.error.HTTPError):
        list(client.pages())
    assert calls["n"] == 1  # no retries


def test_coercion_null_on_malformed(spark):
    rows = [
        _row(1),
        _row(2, **{"Start Date": "not-a-date", "Award Amount": "not-a-number"}),
        _row(3, **{"Start Date": None, "Award Amount": None}),
    ]
    typed = coerce_awards(rows_to_raw_df(spark, rows))
    got = {r.award_id: r for r in typed.collect()}
    assert str(got["1"].start_date) == "2023-12-01"
    assert float(got["1"].award_amount) == 100000.0
    # malformed -> null, not error (reference app/ml_app.py:561-576, 480-485)
    assert got["2"].start_date is None and got["2"].award_amount is None
    assert got["3"].start_date is None and got["3"].award_amount is None


def test_ingest_end_to_end(spark, tmp_path):
    pages = [[_row(i) for i in range(50)], [_row(i) for i in range(50, 80)]]
    transport, _ = fake_transport_pages(pages)
    client = UsaspendingClient(
        "2023-01-01", "2023-12-31", transport=transport, sleep=lambda s: None
    )
    out = str(tmp_path / "awards")
    audit = str(tmp_path / "audit")
    report = ingest(spark, client, out, audit_path=audit, rows_per_write=64)
    assert report.n_rows == 80
    written = spark.read.parquet(out)
    assert written.count() == 80
    assert [f.name for f in written.schema.fields][:5] == [
        "award_id", "recipient_name", "start_date", "end_date", "award_amount",
    ]
    audit_rows = spark.read.parquet(audit).collect()
    assert len(audit_rows) == 1 and audit_rows[0].number_of_rows == 80


def test_geocoder_caps_and_rate_limit(spark):
    df = spark.createDataFrame(
        [(f"name{i % 4}",) for i in range(20)], "recipient_name string"
    )
    looked_up, slept = [], []

    def lookup(name):
        looked_up.append(name)
        return (1.0, 2.0) if name != "name0" else None  # most frequent fails

    geo = build_geo_dim(
        spark, df, "recipient_name", lookup=lookup, max_geo=2, sleep=slept.append
    )
    rows = geo.collect()
    assert len(rows) == 2  # cap at max_geo successes
    assert all(r.latitude == 1.0 for r in rows)
    assert len(slept) == len(looked_up)  # 1 sleep per request (1 rps)


def _write_page_fixtures(tmp_path, n_rows=250, page_size=100):
    import json as _json

    fields_cycle = ["A", "B", "C"]
    rows = [
        {
            "Award ID": f"AW-{i:05d}",
            "Recipient Name": f"Recipient {i}",
            "Start Date": "2024-01-01",
            "End Date": "2024-06-30",
            "Award Amount": str(1000.0 + i),
            "Awarding Agency": f"Agency {i % 5}",
            "Awarding Sub Agency": f"Sub {i % 7}",
            "Contract Award Type": fields_cycle[i % 3],
            "Funding Agency": "F",
            "Funding Sub Agency": "FS",
            "Description": "desc",
            "Last Modified Date": "2024-07-01",
            "Base Obligation Date": "2024-01-01",
        }
        for i in range(n_rows)
    ]
    d = tmp_path / "pages"
    d.mkdir()
    n_pages = (n_rows + page_size - 1) // page_size
    for p in range(n_pages):
        chunk = rows[p * page_size : (p + 1) * page_size]
        body = {
            "results": chunk,
            "page_metadata": {"hasNext": p < n_pages - 1},
        }
        (d / f"page_{p + 1}.json").write_text(_json.dumps(body))
    return str(d), rows


def test_python_datasource_parallel_read_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.sources.datasource import UsaspendingDataSource

    path, rows = _write_page_fixtures(tmp_path)
    spark.dataSource.register(UsaspendingDataSource)
    reader = (
        spark.read.format("usaspending")
        .option("start_date", "2024-01-01")
        .option("end_date", "2024-12-31")
        .option("transport", "file")
        .option("path", path)
        .option("numPartitions", "3")
    )
    df = reader.load()
    assert df.count() == len(rows)
    assert df.rdd.getNumPartitions() == 3
    got_ids = {r.award_id for r in df.select("award_id").collect()}
    assert got_ids == {r["Award ID"] for r in rows}
    # pushdown: the equality filter narrows the award_type_codes payload —
    # the file transport asserts the POST body carries exactly the pushed
    # codes, and the result matches the server-side-filtered expectation
    only_a = reader.load().filter(F.col("contract_award_type") == "A")
    expect_a = sum(1 for r in rows if r["Contract Award Type"] == "A")
    assert only_a.count() == expect_a
    # IN-filter membership also narrows
    in_bc = reader.load().filter(F.col("contract_award_type").isin("B", "C"))
    expect_bc = sum(1 for r in rows if r["Contract Award Type"] in ("B", "C"))
    assert in_bc.count() == expect_bc


def test_python_datasource_typed_coercion_roundtrip(spark, tmp_path):
    from bigdata_usaspending_spark.sources.datasource import UsaspendingDataSource
    from bigdata_usaspending_spark.sources.ingest import coerce_awards

    path, rows = _write_page_fixtures(tmp_path, n_rows=30)
    spark.dataSource.register(UsaspendingDataSource)
    raw = (
        spark.read.format("usaspending")
        .option("start_date", "2024-01-01")
        .option("end_date", "2024-12-31")
        .option("transport", "file")
        .option("path", path)
        .load()
    )
    typed = coerce_awards(raw)
    out = typed.limit(5).collect()
    assert all(str(r.start_date) == "2024-01-01" for r in out)
    assert all(float(r.award_amount) >= 1000.0 for r in out)


def test_python_datasource_pushfilters_claims_and_returns(spark):
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from bigdata_usaspending_spark.sources.datasource import (
        UsaspendingDataSource,
        UsaspendingReader,
    )

    ds = UsaspendingDataSource(
        {"start_date": "2024-01-01", "end_date": "2024-12-31"}
    )
    reader = UsaspendingReader(ds.options, ds.schema())
    eq = EqualTo(("contract_award_type",), "B")
    gt = GreaterThan(("award_amount",), "100")
    unsupported = list(reader.pushFilters([eq, gt]))
    # the award-type equality is CLAIMED (narrows the POST payload);
    # the amount filter goes back to Spark
    assert unsupported == [gt]
    assert reader.award_codes == ["B"]
    # an In on the remaining code set narrows further; a contradictory In
    # is returned to Spark untouched
    r2 = UsaspendingReader(ds.options, ds.schema())
    assert list(r2.pushFilters([In(("contract_award_type",), ("A", "C"))])) == []
    assert r2.award_codes == ["A", "C"]
    contradictory = In(("contract_award_type",), ("Z",))
    assert list(r2.pushFilters([contradictory])) == [contradictory]
    assert r2.award_codes == ["A", "C"]
