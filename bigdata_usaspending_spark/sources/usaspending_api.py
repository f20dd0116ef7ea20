"""Paginated USAspending-API-shaped REST source.

Reference semantics (app/ml_app.py:378-558) preserved:
- POST payload: time_period [{start_date, end_date}] + award_type_codes
  ['A','B','C'] filters and a 13-field projection (:417-442) — the filter and
  projection are *source pushdown*: they travel to the API, not to Spark;
- pagination: 100 rows/page, loop while page_metadata.hasNext (:451-452,520);
- throttle: sleep between batches of 2000 rows (:512-519);
- retry with backoff on timeout/connection error (:522-531).

Replaced anti-patterns:
- per-row CQL INSERT (:488-509) -> rows buffered per batch and bulk-written
  as columnar parquet (sources.ingest);
- driver-side per-row type coercion (:561-576,480-485) -> engine-side
  columnar casts with identical null-on-malformed semantics.

The HTTP transport is injectable (tests pass a fake; the default uses
urllib from the standard library).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

DEFAULT_URL = "https://api.usaspending.gov/api/v2/search/spending_by_award/"

# the reference's 13-field projection (app/ml_app.py:426-441)
FIELDS = [
    "Award ID",
    "Recipient Name",
    "Start Date",
    "End Date",
    "Award Amount",
    "Awarding Agency",
    "Awarding Sub Agency",
    "Contract Award Type",
    "Funding Agency",
    "Funding Sub Agency",
    "Description",
    "Last Modified Date",
    "Base Obligation Date",
]

AWARD_TYPE_CODES = ["A", "B", "C"]  # app/ml_app.py:423
PAGE_SIZE = 100                     # app/ml_app.py:407
THROTTLE_EVERY_ROWS = 2000          # app/ml_app.py:406
THROTTLE_SECONDS = 3.0              # app/ml_app.py:512-519 (3-5s)
TIMEOUT_SECONDS = 60.0              # app/ml_app.py:446
MAX_RETRIES = 3                     # app/ml_app.py:522-531


def default_transport(url: str, payload: dict, timeout: float) -> dict:
    """POST JSON via urllib; returns the decoded JSON response."""
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


@dataclass
class UsaspendingClient:
    start_date: str
    end_date: str
    url: str = DEFAULT_URL
    transport: Callable[[str, dict, float], dict] = default_transport
    page_size: int = PAGE_SIZE
    throttle_every_rows: int = THROTTLE_EVERY_ROWS
    throttle_seconds: float = THROTTLE_SECONDS
    timeout: float = TIMEOUT_SECONDS
    max_retries: int = MAX_RETRIES
    sleep: Callable[[float], None] = time.sleep
    rows_fetched: int = field(default=0, init=False)

    def payload(self, page: int) -> dict:
        """The reference's POST body (app/ml_app.py:417-442)."""
        return {
            "filters": {
                "time_period": [
                    {"start_date": self.start_date, "end_date": self.end_date}
                ],
                "award_type_codes": AWARD_TYPE_CODES,
            },
            "fields": FIELDS,
            "limit": self.page_size,
            "page": page,
        }

    def _fetch_page(self, page: int) -> dict:
        import urllib.error

        attempt = 0
        while True:
            try:
                return self.transport(self.url, self.payload(page), self.timeout)
            except urllib.error.HTTPError:
                # non-transient HTTP status (4xx/5xx): the reference aborted
                # the run on HTTPError (:552-555) instead of re-sending a
                # request the server already rejected
                raise
            except (TimeoutError, ConnectionError, urllib.error.URLError, OSError):
                # transient transport failures only (:522-531)
                attempt += 1
                if attempt > self.max_retries:
                    raise
                self.sleep(3.0)

    def pages(self) -> Iterator[list[dict]]:
        """Yield one list of row dicts per page, following hasNext.

        An empty results page terminates the loop even when the server
        claims hasNext (the reference broke on empty results, :454-455 —
        a server that returns empty pages with hasNext=true would otherwise
        spin forever)."""
        page = 1
        since_throttle = 0
        while True:
            body = self._fetch_page(page)
            rows = body.get("results", [])
            if not rows:
                return
            yield rows
            self.rows_fetched += len(rows)
            since_throttle += len(rows)
            if since_throttle >= self.throttle_every_rows:
                self.sleep(self.throttle_seconds)  # :512-519
                since_throttle = 0
            if not body.get("page_metadata", {}).get("hasNext"):
                return
            page += 1
