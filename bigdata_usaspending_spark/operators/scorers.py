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
- ``VocabCommonnessScorer`` / ``KenLMQualityScorer`` — the QUALITY pair
  on the same pattern: the heuristic default replays
  ``text.commonness_scores`` bit-for-bit against a fitted vocabulary
  histogram (the model artifact), and the KenLM perplexity slot is the
  real model it stands in for.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType

from .text import LANG_MARKERS

# Java's \s is ASCII-only: [ \t\n\x0b\f\r]. Python's Unicode-aware \s also
# matches NBSP/U+2028/etc, so any scorer pinned to a SQL tokenization must
# split on this explicit class (ADVICE r6).
_ASCII_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def spark_tokens(t: str) -> list[str]:
    """Replicate ``text.tokens`` — ``F.split(F.trim(F.lower(c)), r"\\s+")``
    — under Java regex semantics, exactly: lower, then trim (which removes
    SPACE characters only, not tabs/newlines), then split on ASCII
    whitespace runs keeping leading/trailing empty tokens the way Java's
    ``Pattern.split(s, -1)`` does. Token-count-sensitive scorers (the
    commonness score divides by n_tokens) need every one of these edge
    behaviors to match or their doubles drift from the oracle."""
    return _ASCII_WS_RE.split(t.lower().strip(" "))


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
            toks = spark_tokens(t)
            hits = [sum(tok in marker_sets[lang] for tok in toks) for lang in langs]
            best = max(hits)
            if best == 0:
                return "und"
            return langs[hits.index(best)]

        return pd.DataFrame({"lang_pred": [one(t) for t in texts]})


class VocabCommonnessScorer(TextScorer):
    """Quality scoring through the seam: the corpus-frequency commonness
    score (``text.commonness_scores`` — the LM-free perplexity stand-in),
    computed as a pure per-document map against a FITTED vocabulary
    histogram. This is exactly the shape a KenLM/small-LM perplexity
    scorer has — fit once (or download the published model), then score
    every document independently — so the oracle-checked heuristic and
    the real model ride the same seam.

    score = Σ_occurrences corpus_freq(token) / (n_tokens · total_tokens),
    all counts exact ints with ONE final double division — replicated
    bit-for-bit from the operator/SQL form (same IEEE ops in the same
    order; tokenization via ``spark_tokens`` matches the JVM split
    exactly, empty-token edges included). Tokens absent from the
    vocabulary contribute 0 to the numerator but still count in
    n_tokens (OOV penalizes the score — when the vocabulary IS the
    corpus's own histogram there are no OOV tokens and the output equals
    ``text.commonness_scores`` row-for-row, which the oracle query pins).
    Null/non-string text scores null, mirroring the operator's dropped
    rows (filter nulls upstream when pinning row counts).

    The histogram travels either as an in-memory dict (bounded vocabs —
    guarded by ``from_corpus``'s cap) or as a ``vocab_path`` JSON artifact
    read executor-side at ``load()`` time, so a large vocabulary never
    rides the pickled closure — the same contract as a model file."""

    output_schema = "commonness double"

    def __init__(
        self,
        vocab: dict[str, int] | None = None,
        total: int | None = None,
        vocab_path: str | None = None,
    ):
        if (vocab is None) == (vocab_path is None):
            raise ValueError("provide exactly one of vocab or vocab_path")
        if vocab is not None and total is None:
            raise ValueError("total (corpus token count) required with vocab")
        self._vocab = vocab
        self._total = total
        self.vocab_path = vocab_path

    @classmethod
    def from_corpus(
        cls, df: DataFrame, text_col: str = "text", max_vocab: int = 2_000_000
    ) -> "VocabCommonnessScorer":
        """Fit the vocabulary histogram from a corpus (one shuffle over
        per-doc distinct tokens, then a driver collect of the DISTINCT
        vocabulary — NOT the corpus). The cap is a hard guard like
        pq_train_driver's: a web-scale vocabulary must come through
        ``vocab_path`` (or a pruned top-K histogram), never an unbounded
        collect."""
        from pyspark.sql import functions as F

        from .text import tokens

        freq = (
            df.select(F.explode(tokens(text_col)).alias("_tok"))
            .groupBy("_tok")
            .agg(F.count(F.lit(1)).alias("_tf"))
        )
        n_vocab = freq.count()
        if n_vocab > max_vocab:
            raise ValueError(
                f"vocabulary has {n_vocab} distinct tokens > max_vocab="
                f"{max_vocab}; write it to a file and use vocab_path, or "
                "prune to a top-K histogram"
            )
        rows = freq.collect()
        vocab = {r["_tok"]: r["_tf"] for r in rows}
        return cls(vocab=vocab, total=sum(vocab.values()))

    def save(self, path: str) -> None:
        """Persist the fitted histogram as the JSON artifact load() reads.

        A vocab_path-constructed instance materializes its histogram first
        (ADVICE r7: silently writing {"total": null, "vocab": null} would
        produce a corrupt artifact that only fails at score time)."""
        import json

        if self._vocab is None:
            self.load()

        with open(path, "w") as fh:
            json.dump({"total": self._total, "vocab": self._vocab}, fh)

    def load(self) -> None:
        if self._vocab is not None:
            return
        import json

        with open(self.vocab_path) as fh:
            art = json.load(fh)
        self._vocab = art["vocab"]
        self._total = art["total"]

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        vocab, total = self._vocab, self._total

        def one(t):
            if not isinstance(t, str):
                return None
            toks = spark_tokens(t)
            s = 0
            for tok in toks:
                s += vocab.get(tok, 0)
            # the operator's exact expression: _s/( _n * _total ) with every
            # operand cast to double first — ints < 2^53 convert exactly, so
            # this is the same IEEE divide the SQL oracle computes
            return float(s) / (float(len(toks)) * float(total))

        return pd.DataFrame(
            {"commonness": pd.Series([one(t) for t in texts], dtype="float64")}
        )


class KenLMQualityScorer(TextScorer):
    """Real-model quality slot: a KenLM n-gram language model scoring
    per-document perplexity through the identical seam (lazy per-task
    ``load()`` of the .arpa/.bin model, vectorized batch scoring). The
    kenlm package is not in this container, so ``load()`` raises a
    descriptive ImportError; construction and plumbing are real, mirroring
    FastTextLangIdScorer's contract."""

    output_schema = "log10_prob double, perplexity double"

    def __init__(self, model_path: str):
        self.model_path = model_path
        self._model = None

    def load(self) -> None:
        if self._model is not None:
            return
        try:
            import kenlm  # type: ignore[import-not-found]
        except ImportError as exc:
            raise ImportError(
                "KenLMQualityScorer needs the 'kenlm' package and a model "
                f"file at {self.model_path}; install kenlm or use "
                "VocabCommonnessScorer"
            ) from exc
        self._model = kenlm.Model(self.model_path)

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        # Lazy-load contract (ADVICE r7): callers outside apply_text_scorer
        # get load()'s descriptive ImportError, not an AttributeError.
        if self._model is None:
            self.load()
        logs, ppls = [], []
        for t in texts:
            if not isinstance(t, str) or not t:
                logs.append(None)
                ppls.append(None)
                continue
            lp = self._model.score(t, bos=True, eos=True)
            n = len(spark_tokens(t)) + 1  # + eos, KenLM's convention
            logs.append(float(lp))
            ppls.append(float(10.0 ** (-lp / n)))
        return pd.DataFrame(
            {
                "log10_prob": pd.Series(logs, dtype="float64"),
                "perplexity": pd.Series(ppls, dtype="float64"),
            }
        )


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
