"""Corpus wave 10: crawl-tier URL dedup + the trained rerank leg +
the composed corpus-build pipeline as a value oracle.

- ``q_url_dedup`` — URL-level dedup (sources/warc.canonicalize_url +
  url_dedup_groups): the standard FIRST tier of a crawl pipeline —
  canonicalize (case-fold scheme/host, drop fragment, strip default
  ports and tracking params, sort surviving query params, trim trailing
  slashes) and keep one min-id row per canonical URL. The documents
  table has no URL column, so the query synthesizes three deterministic
  noise variants per document (uppercased host + :80 + utm param +
  fragment / plain + trailing tracker / https) from (doc_id, source);
  variants 0 and 1 canonicalize to the SAME URL and must merge, the
  https variant must stay distinct. The whole canonicalization is one
  codegen'd projection (regexp/split/filter/sort built-ins — no UDF),
  replayed expression-for-expression in the oracle.

Same determinism contract as plans/corpus.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..session import apply_runtime_confs
from ..sources.warc import TRACKING_PARAM_RE, url_dedup_groups


def _prep(spark: SparkSession) -> SparkSession:
    return apply_runtime_confs(spark)


def _synth_url() -> "F.Column":
    """Deterministic noisy URL per document, from (doc_id, source) only.

    variant = doc_id % 3, page = doc_id % 7:
      0: ``HTTP://EXAMPLE.COM:80/{source}/page{p}/?utm_source=feed&id={p}#top``
      1: ``http://example.com/{source}/page{p}?id={p}&utm_campaign=x``
      2: ``https://example.com/{source}/page{p}?id={p}``
    Variants 0 and 1 canonicalize identically; 2 differs by scheme."""
    page = (F.col("doc_id") % 7).cast("string")
    v = F.col("doc_id") % 3
    return (
        F.when(
            v == 0,
            F.concat(
                F.lit("HTTP://EXAMPLE.COM:80/"), F.col("source"),
                F.lit("/page"), page, F.lit("/?utm_source=feed&id="), page,
                F.lit("#top"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("http://example.com/"), F.col("source"),
                F.lit("/page"), page, F.lit("?id="), page,
                F.lit("&utm_campaign=x"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://example.com/"), F.col("source"),
                F.lit("/page"), page, F.lit("?id="), page,
            )
        )
        .alias("target_uri")
    )


def q_url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Crawl-tier URL dedup over synthesized noisy URLs: one row per
    canonical URL with the min doc_id and the copy count. One linear
    shuffle keyed on the canonical URL; canonicalization is map-side
    codegen."""
    docs = load(_prep(spark), sf, "documents").select("doc_id", _synth_url())
    return url_dedup_groups(docs, id_col="doc_id", url_col="target_uri")


_SYNTH_URL_SQL = """
    CASE
        WHEN doc_id % 3 = 0 THEN
            'HTTP://EXAMPLE.COM:80/' || source || '/page'
            || CAST(doc_id % 7 AS VARCHAR) || '/?utm_source=feed&id='
            || CAST(doc_id % 7 AS VARCHAR) || '#top'
        WHEN doc_id % 3 = 1 THEN
            'http://example.com/' || source || '/page'
            || CAST(doc_id % 7 AS VARCHAR) || '?id='
            || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x'
        ELSE
            'https://example.com/' || source || '/page'
            || CAST(doc_id % 7 AS VARCHAR) || '?id='
            || CAST(doc_id % 7 AS VARCHAR)
    END
"""


def _url_dedup_oracle() -> str:
    # expression-for-expression replay of sources/warc.canonicalize_url:
    # same regexes (Java ∩ RE2 common subset), same CASE structure, same
    # bytewise param sort
    return f"""
        WITH raw AS (
            SELECT doc_id, {_SYNTH_URL_SQL} AS u0 FROM documents
        ),
        t AS (
            SELECT doc_id, regexp_replace(trim(u0), '#.*$', '') AS u
            FROM raw WHERE u0 IS NOT NULL
        ),
        parts AS (
            SELECT doc_id, u,
                   lower(regexp_extract(
                       u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
                   regexp_replace(
                       u, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest
            FROM t
        ),
        comp AS (
            SELECT doc_id, u, scheme,
                   lower(regexp_extract(authority, '^([^:]*)', 1)) AS host,
                   regexp_extract(authority, ':([0-9]+)$', 1) AS port,
                   substr(rest, len(authority) + 1) AS pathquery
            FROM (
                SELECT *, regexp_extract(rest, '^([^/?]*)', 1) AS authority
                FROM parts
            )
        ),
        pq AS (
            SELECT doc_id, u, scheme, host, port,
                   regexp_replace(
                       regexp_extract(pathquery, '^([^?]*)', 1),
                       '/+$', '') AS path,
                   list_filter(
                       string_split(
                           CASE WHEN contains(pathquery, '?')
                                THEN regexp_replace(pathquery, '^[^?]*\\?', '')
                                ELSE '' END,
                           '&'),
                       p -> p <> ''
                            AND NOT regexp_matches(
                                p, '{TRACKING_PARAM_RE}')) AS kept
            FROM comp
        ),
        canon AS (
            SELECT doc_id,
                   CASE WHEN scheme = '' THEN u ELSE
                       scheme || '://' || host
                       || CASE WHEN port = ''
                                    OR (scheme = 'http' AND port = '80')
                                    OR (scheme = 'https' AND port = '443')
                               THEN '' ELSE ':' || port END
                       || path
                       || CASE WHEN len(kept) > 0
                               THEN '?' || array_to_string(
                                   list_sort(kept), '&')
                               ELSE '' END
                   END AS canonical_url
            FROM pq
        )
        SELECT canonical_url, MIN(doc_id) AS doc_id,
               COUNT(*) AS n_copies
        FROM canon GROUP BY canonical_url
    """


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_url_dedup": q_url_dedup,
}

ROWS_ONLY_QUERIES: set[str] = set()

ORACLE_SQL: dict[str, str] = {
    "q_url_dedup": _url_dedup_oracle(),
}
