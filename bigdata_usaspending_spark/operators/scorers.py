"""Pluggable per-document text scorers (the model seam for text.py).

``text.langid`` and ``text.commonness_scores`` are deliberately SQL-only
heuristics so they stay oracle-checkable, but a production corpus pipeline
scores documents with real models — fastText/CLD3 for language ID, a KenLM
or small-LM perplexity for quality. This module defines the seam those
models plug into, so swapping the heuristic for a model is a config change,
not a rewrite:

- ``TextScorer`` — the interface: ``output_schema`` (DDL fragment of the
  appended columns), ``load()`` (heavyweight model init, invoked lazily
  ONCE per task before the first batch — the model object never rides the
  pickled closure), ``score_batch(texts) -> pd.DataFrame`` (vectorized,
  one row per input in order).
- ``apply_text_scorer(df, scorer, text_col)`` — runs any scorer over the
  corpus as ONE Arrow-batched mapInPandas pass: no shuffle, all input
  columns preserved, scorer columns appended. At 100 TB this is a pure
  map over document partitions; model memory is per-executor-worker, not
  per-row, and batch size rides spark.sql.execution.arrow.maxRecordsPerBatch.
- ``HeuristicLangIdScorer`` — the default implementation: a vectorized
  pandas replication of ``text.langid``'s marker voting, pinned by test to
  agree with the SQL form row-for-row (so the seam's default never drifts
  from the oracle-checked column).
- ``FastTextLangIdScorer`` — the real-model slot: loads a fastText .bin at
  ``load()`` time. The fasttext package is not in this container, so
  construction works (plumbing is real) and ``load()`` raises a clear
  ImportError until the dependency and model file are provided.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType

from .text import LANG_MARKERS


class TextScorer:
    """Interface for per-document scorers applied via apply_text_scorer.

    Subclasses set ``output_schema`` (a DDL fragment like
    ``"lang_pred string, lang_conf double"``) and implement
    ``score_batch``. Override ``load`` for heavyweight init (model file
    read, native lib) — it runs lazily once per task, executor-side,
    before the first batch, and MUST be idempotent (Spark may retry
    tasks)."""

    output_schema: str = ""

    def load(self) -> None:  # pragma: no cover - default no-op
        """One-time per-task init hook (model loading)."""

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        """Return one row per input text, columns matching output_schema,
        positionally aligned with ``texts`` (index is ignored)."""
        raise NotImplementedError


def apply_text_scorer(
    df: DataFrame, scorer: TextScorer, text_col: str = "text"
) -> DataFrame:
    """Score every document with ``scorer`` in one Arrow-batched pass.

    The scorer object is pickled into the task closure; its ``load()``
    runs once per task before the first batch (lazy, so driver-side
    construction stays cheap and the model never serializes). Output =
    all input columns + the scorer's columns. ZERO shuffles — this is a
    map over whatever partitioning ``df`` already has."""
    out_fields = list(StructType.fromDDL(scorer.output_schema).fields)
    clash = {f.name for f in out_fields} & set(df.columns)
    if clash:
        raise ValueError(f"scorer output collides with input columns: {clash}")
    schema = StructType(
        [StructField(f.name, f.dataType, f.nullable) for f in df.schema.fields]
        + out_fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        loaded = False
        for pdf in batches:
            if pdf.empty:
                continue
            if not loaded:
                scorer.load()
                loaded = True
            scores = scorer.score_batch(pdf[text_col])
            if len(scores) != len(pdf):
                raise ValueError(
                    f"scorer returned {len(scores)} rows for a "
                    f"{len(pdf)}-row batch"
                )
            yield pd.concat(
                [pdf.reset_index(drop=True), scores.reset_index(drop=True)],
                axis=1,
            )

    return df.mapInPandas(run, schema=schema)


class HeuristicLangIdScorer(TextScorer):
    """Default scorer: the marker-stopword voting of ``text.langid``,
    replicated in pandas. Semantics pinned to the SQL form (and so to the
    oracle) by test: whitespace tokens of trim(lower(text)), per-language
    marker hit counts, argmax with LANG_MARKERS priority on ties, 'und'
    for zero hits or null text."""

    output_schema = "lang_pred string"

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        langs = list(LANG_MARKERS)
        marker_sets = {lang: frozenset(m) for lang, m in LANG_MARKERS.items()}

        def one(t) -> str:
            if not isinstance(t, str):
                return "und"
            # explicit ASCII whitespace class: Java's \s (the SQL langid
            # path splits JVM-side) is [ \t\n\x0b\f\r] ONLY, while
            # Python's Unicode-aware \s also matches NBSP/U+2028/etc —
            # a document containing Unicode whitespace must tokenize
            # identically on both sides or the pinned-to-oracle guarantee
            # breaks (strip likewise restricted)
            toks = re.split(r"[ \t\n\x0b\f\r]+", t.strip(" \t\n\x0b\f\r").lower())
            hits = [sum(tok in marker_sets[lang] for tok in toks) for lang in langs]
            best = max(hits)
            if best == 0:
                return "und"
            return langs[hits.index(best)]

        return pd.DataFrame({"lang_pred": [one(t) for t in texts]})


class FastTextLangIdScorer(TextScorer):
    """Real-model language ID through the same seam: fastText lid.176.bin
    (or compatible). The model loads executor-side at ``load()`` — the
    driver only ships this small object and the path. fasttext is not
    installed in this container, so ``load()`` raises a descriptive
    ImportError; the Spark-side plumbing (schema, batching, laziness) is
    identical to the heuristic scorer and is what the tests exercise."""

    output_schema = "lang_pred string, lang_conf double"

    def __init__(self, model_path: str):
        self.model_path = model_path
        self._model = None

    def load(self) -> None:
        if self._model is not None:
            return
        try:
            import fasttext  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - exercised in tests
            raise ImportError(
                "FastTextLangIdScorer needs the 'fasttext' package and a "
                f"model file at {self.model_path}; install fasttext or use "
                "HeuristicLangIdScorer"
            ) from exc
        self._model = fasttext.load_model(self.model_path)

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        cleaned = [
            (t.replace("\n", " ") if isinstance(t, str) else "") for t in texts
        ]
        labels, confs = self._model.predict(cleaned)
        return pd.DataFrame(
            {
                "lang_pred": [
                    ls[0].removeprefix("__label__") if ls else "und"
                    for ls in labels
                ],
                "lang_conf": [float(cs[0]) if len(cs) else 0.0 for cs in confs],
            }
        )
