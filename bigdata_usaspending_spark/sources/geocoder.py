"""Rate-limited geocoding enrichment producing the small geo dims.

Reference (app/fetch_recipient_name_geo_data.py, app/fetch_awarding_sub_agency
_geo_data.py): pull every entity name through the driver, Counter-count,
geocode the most frequent via Nominatim at 1 req/s, stop after 10 successes,
insert rows one by one.

Here: the frequency ranking runs distributed (groupBy.count + top-n), only
the tiny top-n list is collected; the geocode loop stays driver-side by
design (it is a 1-rps external API — parallelism is pointless) and the
result lands as one bulk DataFrame. Both reference scripts collapse into one
parameterized job.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..operators.topk import top_n_frequency

NOMINATIM_URL = "https://nominatim.openstreetmap.org/search"


def default_lookup(name: str) -> tuple[float, float] | None:
    """GET nominatim search?q=name&limit=1 -> (lat, lon) or None
    (reference app/fetch_recipient_name_geo_data.py:35-64)."""
    import urllib.parse
    import urllib.request

    url = f"{NOMINATIM_URL}?{urllib.parse.urlencode({'q': name, 'format': 'json', 'limit': 1})}"
    req = urllib.request.Request(url, headers={"User-Agent": "bigdata-usaspending-spark"})
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        results = json.loads(resp.read().decode("utf-8"))
    if not results:
        return None
    return float(results[0]["lat"]), float(results[0]["lon"])


def build_geo_dim(
    spark: SparkSession,
    df: DataFrame,
    name_col: str,
    lookup: Callable[[str], tuple[float, float] | None] = default_lookup,
    max_geo: int = 10,
    candidates: int = 50,
    rate_limit_seconds: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Geocode the most frequent non-null values of ``name_col``; stop after
    ``max_geo`` successes (reference cap, :123). Returns a geo dim DataFrame
    (name, latitude, longitude) ready to broadcast-join."""
    top = top_n_frequency(df.dropna(subset=[name_col]), name_col, candidates)
    names = [r[name_col] for r in top.collect()]
    rows: list[tuple[str, float, float]] = []
    for name in names:
        if len(rows) >= max_geo:
            break
        coords = lookup(name)
        if coords is not None:
            rows.append((name, coords[0], coords[1]))
        sleep(rate_limit_seconds)  # 1 rps (:133)
    return spark.createDataFrame(rows, schemas.geo_dim(name_col))
