"""Composed query plans: the oracle-checked corpus, rollup ETL, dashboard."""

from __future__ import annotations


def all_queries():
    """Merged registry: reference-parity corpus + training-data extensions
    + the generalized operator surface."""
    from . import corpus, corpus_ext, corpus_llm, corpus_more, corpus_ts

    merged = dict(corpus.QUERIES)
    merged.update(corpus_ext.QUERIES)
    merged.update(corpus_more.QUERIES)
    merged.update(corpus_llm.QUERIES)
    merged.update(corpus_ts.QUERIES)
    return merged


def all_oracles():
    from . import corpus, corpus_ext, corpus_llm, corpus_more, corpus_ts

    merged = dict(corpus.ORACLE_SQL)
    merged.update(corpus_ext.ORACLE_SQL)
    merged.update(corpus_more.ORACLE_SQL)
    merged.update(corpus_llm.ORACLE_SQL)
    merged.update(corpus_ts.ORACLE_SQL)
    return merged


def rows_only_queries():
    from . import corpus, corpus_ext, corpus_llm, corpus_more, corpus_ts

    return (
        set(corpus.ROWS_ONLY_QUERIES)
        | set(corpus_ext.ROWS_ONLY_QUERIES)
        | set(corpus_more.ROWS_ONLY_QUERIES)
        | set(corpus_llm.ROWS_ONLY_QUERIES)
        | set(corpus_ts.ROWS_ONLY_QUERIES)
    )
