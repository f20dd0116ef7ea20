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


class BigramLMScorer(TextScorer):
    """A REAL (if tiny) n-gram language model in the quality seat — the
    offline-trainable leg of the KenLM slot (VERDICT r7 #5): an order-2
    interpolated LM fitted ON a corpus, scoring per-document log10
    probability and perplexity through the identical seam. Where
    ``VocabCommonnessScorer`` is a frequency heuristic, this is genuine
    sequence modeling — unigram-interpolated bigram probabilities with
    BOS/EOS markers, KenLM's own scoring convention (``score(bos=True,
    eos=True)``, perplexity over n_tokens+1 events) — so swapping in a
    full KenLM .arpa is purely a model-artifact change.

    Model: for each position i in ``<s> w1 … wn </s>`` (i >= 1),

        p(w_i | w_{i-1}) = lam * c2(w_{i-1}, w_i) / c_ctx(w_{i-1})
                         + (1-lam) * (c1(w_i) + 1) / (T + V + 1)

    with c2 = bigram count, c_ctx = context count (row-sum of c2), c1 =
    emitted-token count (tokens + EOS), T = total emitted tokens, V =
    emitted vocabulary size; add-one smoothing keeps the unigram leg
    nonzero so the interpolated probability never hits log(0) even for
    OOV tokens (where the bigram leg is 0). ``log10_prob`` folds the
    per-position log10 terms LEFT-TO-RIGHT from 0.0; ``perplexity`` =
    10^(-log10_prob / (n_tokens+1)).

    Determinism: every count is an exact int; each position's probability
    is a fixed tree of IEEE divides/multiplies/adds; log10 and pow are the
    platform libm both here and in DuckDB — so documents score
    bit-identically to the self-contained SQL formulation
    (plans/corpus_r8), the same ln-parity contract BM25 pins. Tokenization
    is ``spark_tokens`` (the JVM-split replica), so the LM sees exactly
    the tokens the SQL oracle derives. Caveat: a corpus containing literal
    ``<s>``/``</s>`` tokens would alias the markers — assert-guarded in
    ``from_corpus``.

    The fitted model travels as an in-memory dict (cap-guarded
    ``from_corpus`` collect — distinct bigrams, NOT the corpus) or as a
    ``model_path`` JSON artifact read executor-side at ``load()``,
    identical to VocabCommonnessScorer's contract."""

    output_schema = "log10_prob double, perplexity double"
    BOS = "<s>"
    EOS = "</s>"

    def __init__(
        self, model: dict | None = None, model_path: str | None = None
    ):
        if (model is None) == (model_path is None):
            raise ValueError("provide exactly one of model or model_path")
        self._model = model
        self.model_path = model_path

    @classmethod
    def from_corpus(
        cls,
        df: DataFrame,
        text_col: str = "text",
        lam: float = 0.7,
        max_ngrams: int = 2_000_000,
    ) -> "BigramLMScorer":
        """Fit the bigram table from a corpus: ONE exploded pair aggregate
        (the only shuffle), then a driver collect of the DISTINCT bigram
        histogram — unigram, context, and total counts all derive from it
        driver-side, so the model state is one bounded table. The cap is a
        hard guard (pq_train_driver pattern): a web-scale LM must come
        through ``model_path`` (e.g. a pruned KenLM-exported table)."""
        if not 0.0 < lam < 1.0:
            raise ValueError("lam must be in (0, 1)")
        rows = cls._bigram_hist(df, text_col, max_ngrams)
        return cls(model=cls._model_from_hist(rows, "_c", lam))

    @classmethod
    def _bigram_hist(
        cls,
        df: DataFrame,
        text_col: str,
        max_ngrams: int,
        flags: "dict | None" = None,
    ) -> list:
        """Distinct-bigram histogram rows from ONE exploded-pair aggregate
        (the only shuffle). ``flags`` (name -> boolean Column evaluated
        per document) adds one conditional count column ``_c_<name>`` per
        flag beside the total ``_c`` — how two LMs over nested corpora fit
        in a single corpus scan."""
        from pyspark.sql import functions as F

        from .text import tokens

        toks = tokens(text_col)
        seq = F.concat(
            F.array(F.lit(cls.BOS)), toks, F.array(F.lit(cls.EOS))
        )
        # Bind the sequence as a column FIRST, then pair adjacent elements
        # with zip_with over two slices. Building the pair structs with
        # per-index element_at(seq, i) lambdas instead embeds the whole
        # lower/trim/split/concat expression in every element access —
        # HOF lambda bodies are not common-subexpression-eliminated, so
        # the corpus gets re-tokenized once per POSITION (O(len^2) string
        # work per document; measured 14 s vs 0.6 s for the sf0.1 fit).
        n1 = F.size("_seq") - F.lit(1)
        pairs = F.zip_with(
            F.slice("_seq", 1, n1),
            F.slice("_seq", 2, n1),
            lambda p, w: F.struct(p.alias("prev"), w.alias("w")),
        )
        flags = flags or {}
        flag_cols = [c.alias(f"_f_{k}") for k, c in flags.items()]
        aggs = [F.count(F.lit(1)).alias("_c")] + [
            F.count(F.when(F.col(f"_f_{k}"), F.lit(1))).alias(f"_c_{k}")
            for k in flags
        ]
        bi_df = (
            df.filter(F.col(text_col).isNotNull())
            .select(seq.alias("_seq"), *flag_cols)
            .select(F.explode(pairs).alias("_p"), *[f"_f_{k}" for k in flags])
            .groupBy("_p.prev", "_p.w")
            .agg(*aggs)
        )
        # limit(cap+1): one job both bounds driver memory and detects
        # overflow (count()+collect() would run the aggregate twice)
        rows = bi_df.limit(max_ngrams + 1).collect()
        if len(rows) > max_ngrams:
            raise ValueError(
                f"corpus has more than max_ngrams={max_ngrams} distinct "
                "bigrams; fit offline and use model_path"
            )
        return rows

    @classmethod
    def _model_from_hist(cls, rows: list, count_col: str, lam: float) -> dict:
        """Build the model dict from histogram rows, skipping zero counts
        (a conditional count of 0 means the bigram never occurred in that
        sub-corpus — identical to fitting on the subset directly)."""
        bi: dict[str, dict[str, int]] = {}
        for r in rows:
            if r[count_col]:
                bi.setdefault(r["prev"], {})[r["w"]] = r[count_col]
        uni: dict[str, int] = {}
        ctx: dict[str, int] = {}
        for prev, ws in bi.items():
            for w, c in ws.items():
                uni[w] = uni.get(w, 0) + c
                ctx[prev] = ctx.get(prev, 0) + c
        # structural BOS only ever appears as a context, structural EOS
        # only ever as an emission — the converse means the corpus itself
        # contains marker-lookalike tokens, which would alias the LM state
        if cls.BOS in uni or cls.EOS in ctx:
            raise ValueError(
                "corpus contains literal '<s>'/'</s>' tokens — they alias "
                "the sentence markers; pre-scrub or remap them"
            )
        return {
            "lam": lam,
            "t": sum(uni.values()),
            "v": len(uni),
            "uni": uni,
            "ctx": ctx,
            "bi": bi,
        }

    def save(self, path: str) -> None:
        """Persist the fitted model as the JSON artifact load() reads
        (materializing a model_path-constructed instance first — the
        VocabCommonnessScorer.save contract)."""
        import json

        if self._model is None:
            self.load()
        with open(path, "w") as fh:
            json.dump(self._model, fh)

    def load(self) -> None:
        if self._model is not None:
            return
        import json

        with open(self.model_path) as fh:
            self._model = json.load(fh)

    def lp_tokens(self, toks: "list[str]") -> float:
        """log10 probability of one pre-tokenized document (the fixed
        left-to-right fold over ``<s> toks </s>`` events). Exposed so
        multi-model scorers (DSIR's ratio scorer) can tokenize ONCE and
        score under several models; score_batch is this plus
        tokenization and the perplexity transform."""
        import math

        if self._model is None:
            self.load()
        m = self._model
        lam = float(m["lam"])
        one_minus_lam = 1.0 - lam
        t_plus = float(m["t"]) + float(m["v"]) + 1.0
        uni, ctx, bi = m["uni"], m["ctx"], m["bi"]
        seq = [self.BOS] + toks + [self.EOS]
        lp = 0.0
        for i in range(1, len(seq)):
            prev, w = seq[i - 1], seq[i]
            cc = ctx.get(prev, 0)
            # bi.get, not bi[...]: an externally authored artifact (e.g.
            # a pruned KenLM export) can keep a context's count in ctx
            # while its bigram row was pruned from bi — degrade to the
            # smoothed unigram leg instead of a per-task KeyError.
            pb = float(bi.get(prev, {}).get(w, 0)) / float(cc) if cc else 0.0
            pu = (float(uni.get(w, 0)) + 1.0) / t_plus
            lp += math.log10(lam * pb + one_minus_lam * pu)
        return lp

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        if self._model is None:
            self.load()
        logs, ppls = [], []
        for txt in texts:
            if not isinstance(txt, str):
                logs.append(None)
                ppls.append(None)
                continue
            toks = spark_tokens(txt)
            lp = self.lp_tokens(toks)
            n = len(toks) + 1
            logs.append(lp)
            ppls.append(10.0 ** (-lp / float(n)))
        return pd.DataFrame(
            {
                "log10_prob": pd.Series(logs, dtype="float64"),
                "perplexity": pd.Series(ppls, dtype="float64"),
            }
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


class PairScorer:
    """Interface for pairwise (query, document) scorers — the RERANK
    seam. Retrieval produces candidates cheaply (BM25 / ANN / RRF over
    the whole corpus); reranking re-scores only the candidate pairs with
    a more expensive model (production: a cross-encoder). Contract
    mirrors ``TextScorer``: ``output_schema`` (DDL fragment), lazy
    idempotent ``load()`` once per task, vectorized ``score_pairs``
    returning one row per input pair in order."""

    output_schema: str = ""

    def load(self) -> None:  # pragma: no cover - default no-op
        """One-time per-task init hook (model loading)."""

    def score_pairs(
        self, queries: pd.Series, texts: pd.Series
    ) -> pd.DataFrame:
        """Return one row per (query, text) pair, columns matching
        output_schema, positionally aligned (index is ignored)."""
        raise NotImplementedError


def apply_pair_scorer(
    df: DataFrame,
    scorer: PairScorer,
    query_col: str = "query_text",
    text_col: str = "text",
) -> DataFrame:
    """Score every (query, document) row with ``scorer`` in one
    Arrow-batched mapInPandas pass — the rerank twin of
    ``apply_text_scorer``, with the identical 100-TB shape: a pure map
    over candidate partitions, ZERO shuffles, model memory per
    executor-worker, all input columns preserved. Candidates are
    top-k-bounded upstream, so this pass touches O(queries x k) rows no
    matter how big the corpus was."""
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
            scores = scorer.score_pairs(pdf[query_col], pdf[text_col])
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


class TokenOverlapPairScorer(PairScorer):
    """Default reranker: query-term coverage — the fraction of the
    query's DISTINCT tokens present in the document,
    ``|distinct_tokens(q) ∩ tokens(d)| / |distinct_tokens(q)|``. The
    LM-free cross-encoder stand-in: exact int counts with one final
    double division (tokenization via ``spark_tokens``), so it replays
    bit-for-bit in SQL —

        size(array_intersect(array_distinct(tokens(q)), tokens(d)))
          / size(array_distinct(tokens(q)))

    — which is what the agreement test pins. Null/non-string on either
    side scores null."""

    output_schema = "rerank double"

    def score_pairs(
        self, queries: pd.Series, texts: pd.Series
    ) -> pd.DataFrame:
        out = []
        for q, t in zip(queries, texts):
            if not isinstance(q, str) or not isinstance(t, str):
                out.append(None)
                continue
            qtoks = list(dict.fromkeys(spark_tokens(q)))
            dtoks = set(spark_tokens(t))
            hits = sum(1 for tok in qtoks if tok in dtoks)
            out.append(float(hits) / float(len(qtoks)))
        return pd.DataFrame({"rerank": pd.Series(out, dtype="float64")})


class CrossEncoderPairScorer(PairScorer):
    """Real-model rerank slot: a sentence-transformers CrossEncoder
    scoring (query, document) pairs through the identical seam. The
    sentence_transformers package is not in this container, so
    ``load()`` raises a descriptive ImportError; construction and
    plumbing are real, mirroring FastTextLangIdScorer's contract."""

    output_schema = "rerank double"

    def __init__(self, model_path: str, batch_size: int = 32):
        self.model_path = model_path
        self.batch_size = batch_size
        self._model = None

    def load(self) -> None:
        if self._model is not None:
            return
        try:
            from sentence_transformers import (  # type: ignore[import-not-found]
                CrossEncoder,
            )
        except ImportError as exc:
            raise ImportError(
                "CrossEncoderPairScorer needs the 'sentence_transformers' "
                f"package and a model at {self.model_path}; install it or "
                "use TokenOverlapPairScorer"
            ) from exc
        self._model = CrossEncoder(self.model_path)

    def score_pairs(
        self, queries: pd.Series, texts: pd.Series
    ) -> pd.DataFrame:
        if self._model is None:
            self.load()
        pairs = [
            (q if isinstance(q, str) else "", t if isinstance(t, str) else "")
            for q, t in zip(queries, texts)
        ]
        preds = self._model.predict(pairs, batch_size=self.batch_size)
        return pd.DataFrame(
            {"rerank": pd.Series([float(p) for p in preds], dtype="float64")}
        )


class TrigramLangIdScorer(TextScorer):
    """A REAL (if tiny) trained language-ID model in the fastText seat —
    the offline-trainable leg of that slot, exactly as BigramLMScorer is
    for KenLM: per-language character-trigram naive Bayes fitted ON a
    labeled corpus, scoring through the identical seam. Swapping in
    fastText's lid.176.bin is purely a model-artifact change.

    Model: for each language L seen in training (with at least one
    trigram event — a label whose every document is shorter than 3
    characters contributes nothing and is absent from the model),

        score(doc, L) = Σ_i log10( (c_L(tri_i) + 1) / (T_L + V + 1) )

    over the document's character trigrams in position order — add-one-
    smoothed per-language trigram likelihoods (T_L = L's total trigram
    events, V = the corpus-wide distinct-trigram count); prediction is
    the argmax language, ties on ascending language code; a document
    with fewer than 3 characters scores 0.0 for every language (argmax =
    lowest code). ``lp_model`` is the winning score.

    Determinism contract (the BM25/LM ln-parity class): counts are exact
    ints from one Spark aggregate, each event term is one fixed IEEE
    tree, the per-language sum folds LEFT-TO-RIGHT from 0.0 — so scoring
    replays bit-for-bit in self-contained SQL (plans/corpus_r9's
    q_langid_trained). Case folding is NOT part of this class's parity
    surface: feed it a pre-lowered column (``F.lower`` Spark-side,
    ``lower()`` in the oracle — the established cross-engine pair);
    Python's locale-sensitive ``str.lower`` never runs.

    The fitted model travels as an in-memory dict (cap-guarded collect of
    the DISTINCT (lang, trigram) histogram) or as a ``model_path`` JSON
    artifact, identical to BigramLMScorer's contract."""

    output_schema = "lang_model string, lp_model double"

    def __init__(
        self, model: dict | None = None, model_path: str | None = None
    ):
        if (model is None) == (model_path is None):
            raise ValueError("provide exactly one of model or model_path")
        self._model = model
        self.model_path = model_path
        self._terms: "dict[str, dict[str, float]] | None" = None

    @classmethod
    def from_corpus(
        cls,
        df: DataFrame,
        text_col: str = "text",
        lang_col: str = "lang",
        max_ngrams: int = 2_000_000,
    ) -> "TrigramLangIdScorer":
        """Fit per-language trigram counts: ONE exploded aggregate over
        character trigrams (built with zip_with over three slices of the
        split-chars column — bound columns, never per-index substring
        lambdas, the from_corpus O(len^2) lesson), then a driver collect
        of the DISTINCT (lang, trigram) histogram."""
        from pyspark.sql import functions as F

        n = F.length(F.col(text_col))
        chars = F.split(F.col(text_col), "")
        tri = F.when(
            n >= 3,
            F.zip_with(
                F.slice(chars, 1, n - 2),
                F.zip_with(
                    F.slice(chars, 2, n - 2),
                    F.slice(chars, 3, n - 2),
                    lambda y, z: F.concat(y, z),
                ),
                lambda x, yz: F.concat(x, yz),
            ),
        ).otherwise(F.array().cast("array<string>"))
        hist = (
            df.filter(
                F.col(text_col).isNotNull() & F.col(lang_col).isNotNull()
            )
            .select(F.col(lang_col).alias("_lang"), F.explode(tri).alias("_tri"))
            .groupBy("_lang", "_tri")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # limit(cap+1) bounds driver memory AND detects overflow in the
        # same job — count()+collect() would run the exploded aggregate
        # over the whole corpus twice (the ivf_index_topk pattern)
        rows = hist.limit(max_ngrams + 1).collect()
        if len(rows) > max_ngrams:
            raise ValueError(
                f"corpus has more than max_ngrams={max_ngrams} distinct "
                "(lang, trigram) rows; fit offline and use model_path"
            )
        cnt: dict[str, dict[str, int]] = {}
        for r in rows:
            cnt.setdefault(r["_lang"], {})[r["_tri"]] = r["_c"]
        if not cnt:
            raise ValueError(
                "no trigram events to fit on (every labeled document is "
                "null or shorter than 3 characters)"
            )
        tot = {lang: sum(tris.values()) for lang, tris in cnt.items()}
        vocab = set()
        for tris in cnt.values():
            vocab.update(tris)
        return cls(
            model={"cnt": cnt, "tot": tot, "v": len(vocab)}
        )

    def save(self, path: str) -> None:
        import json

        if self._model is None:
            self.load()
        with open(path, "w") as fh:
            json.dump(self._model, fh)

    def load(self) -> None:
        if self._model is not None:
            return
        import json

        with open(self.model_path) as fh:
            self._model = json.load(fh)

    def _ensure_terms(self) -> None:
        """Memoize each (lang, trigram) log term ONCE per scorer instance
        (i.e. once per task under the seam's lazy load, NOT once per
        Arrow batch): the model vocabulary is bounded, so log10 runs
        O(vocab) times instead of O(events) — the fold then sums CACHED
        doubles in position order, which is bit-identical to recomputing
        per event (same value, same order)."""
        import math

        if self._terms is not None:
            return
        if self._model is None:
            self.load()
        m = self._model
        v1 = float(m["v"]) + 1.0
        terms: dict[str, dict[str, float]] = {}
        oov: dict[str, float] = {}
        for lang in sorted(m["cnt"]):
            d = float(m["tot"][lang]) + v1
            terms[lang] = {
                t: math.log10((float(c) + 1.0) / d)
                for t, c in m["cnt"][lang].items()
            }
            oov[lang] = math.log10(1.0 / d)
        self._terms = terms
        self._oov = oov

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        self._ensure_terms()
        langs = sorted(self._terms)
        terms, oov = self._terms, self._oov
        preds, lps = [], []
        for txt in texts:
            if not isinstance(txt, str):
                preds.append(None)
                lps.append(None)
                continue
            tris = [txt[i : i + 3] for i in range(len(txt) - 2)]
            best_lang, best_lp = None, None
            for lang in langs:
                lt = terms[lang]
                lo = oov[lang]
                lp = 0.0
                for t in tris:
                    lp += lt.get(t, lo)
                # strict > : ties keep the earlier (ascending) language
                if best_lp is None or lp > best_lp:
                    best_lang, best_lp = lang, lp
            preds.append(best_lang)
            lps.append(best_lp)
        return pd.DataFrame(
            {
                "lang_model": preds,
                "lp_model": pd.Series(lps, dtype="float64"),
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


class NaiveBayesPairScorer(PairScorer):
    """A TRAINED pairwise reranker in the CrossEncoder seat — the
    offline-trainable leg of the rerank slot, completing the seam
    pattern (TrigramLangIdScorer is to fastText what this is to a
    cross-encoder): Bernoulli naive Bayes over per-query-token document
    presence, fitted on labeled (query, document, relevance) pairs.

    Model: for each token w seen in a training QUERY,
        q_rel(w)/q_non(w) = relevant / non-relevant pairs whose query
                            contains w,
        m_rel(w)/m_non(w) = those pairs where the DOCUMENT also
                            contains w.
    With add-one/add-two (Laplace) smoothing,
        p_rel(w) = (m_rel+1)/(q_rel+2),   p_non(w) = (m_non+1)/(q_non+2),
    and a candidate pair scores, over the query's distinct tokens in
    first-occurrence order,
        rerank = Σ_w  log10(p_rel/p_non)          if w present in doc
                      log10((1-p_rel)/(1-p_non))  if absent,
    i.e. the NB log-likelihood ratio. Tokens absent from the model (OOV)
    contribute nothing; the class prior is a per-query constant and is
    omitted (rank-invariant within a query). Unlike the token-overlap
    default, the model LEARNS per-term discriminativeness — terms whose
    presence separates relevant from non-relevant pairs dominate, corpus
    stopwords cancel (p_rel ≈ p_non → term ≈ 0).

    Determinism contract (the TrigramLangIdScorer class): counts are
    exact ints from ONE Spark aggregate; each log term is one fixed IEEE
    expression tree; the per-pair sum folds left-to-right in query-token
    position order — so fit AND scoring replay bit-for-bit in
    self-contained SQL (plans/corpus_r10.q_rerank_trained). Tokenization
    is ``spark_tokens`` on both sides (feed pre-lowered text or rely on
    the tokenizer's own lower()). The fitted model travels as an
    in-memory dict (cap-guarded collect) or a ``model_path`` JSON
    artifact, identical to BigramLMScorer's contract.
    """

    output_schema = "rerank double"

    def __init__(
        self, model: dict | None = None, model_path: str | None = None
    ):
        if (model is None) == (model_path is None):
            raise ValueError("provide exactly one of model or model_path")
        self._model = model
        self.model_path = model_path
        self._terms: "dict[str, tuple[float, float]] | None" = None

    @classmethod
    def from_pairs(
        cls,
        df: DataFrame,
        query_col: str = "query_text",
        text_col: str = "text",
        label_col: str = "label",
        max_terms: int = 1_000_000,
    ) -> "NaiveBayesPairScorer":
        """Fit per-token match counts: explode the query's distinct
        tokens, test document presence per exploded row (the document
        token array is scanned once PER QUERY TOKEN — the
        presence-before-explode form would scan it once per pair, but
        its HOF lambda trips Catalyst over broadcast-join lineages, see
        the comment below; queries are short, so the extra scans are
        bounded), then ONE aggregate and a cap-guarded driver collect —
        the same bounded-fit shape as TrigramLangIdScorer.from_corpus."""
        from pyspark.sql import functions as F

        from .text import tokens

        # no higher-order-function lambdas here: a HOF lambda whose body
        # references a sibling column trips Catalyst attribute binding
        # when the input lineage contains a broadcast join (observed on
        # Spark 4.1: INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND). Explode the
        # query tokens first, then plain array_contains(col, col) —
        # per-token duplication of the doc token array is bounded by the
        # short-query contract of the rerank stage.
        ev = (
            df.filter(
                F.col(query_col).isNotNull()
                & F.col(text_col).isNotNull()
                & F.col(label_col).isNotNull()
            )
            .select(
                F.col(label_col).cast("int").alias("_y"),
                F.array_distinct(tokens(query_col)).alias("_qt"),
                tokens(text_col).alias("_dt"),
            )
            .select("_y", F.explode("_qt").alias("_w"), "_dt")
            .select(
                "_y",
                "_w",
                F.array_contains("_dt", F.col("_w")).cast("int").alias("_m"),
            )
        )
        hist = ev.groupBy("_w").agg(
            F.sum("_y").alias("q_rel"),
            F.sum(F.col("_y") * F.col("_m")).alias("m_rel"),
            F.sum(F.lit(1) - F.col("_y")).alias("q_non"),
            F.sum((F.lit(1) - F.col("_y")) * F.col("_m")).alias("m_non"),
        )
        rows = hist.limit(max_terms + 1).collect()
        if len(rows) > max_terms:
            raise ValueError(
                f"training pairs have more than max_terms={max_terms} "
                "distinct query tokens; fit offline and use model_path"
            )
        if not rows:
            raise ValueError("no (query, document, label) events to fit on")
        cnt = {
            r["_w"]: [int(r["m_rel"]), int(r["q_rel"]),
                      int(r["m_non"]), int(r["q_non"])]
            for r in rows
        }
        return cls(model={"cnt": cnt})

    def save(self, path: str) -> None:
        import json

        if self._model is None:
            self.load()
        with open(path, "w") as fh:
            json.dump(self._model, fh)

    def load(self) -> None:
        if self._model is not None:
            return
        import json

        with open(self.model_path) as fh:
            self._model = json.load(fh)

    def _ensure_terms(self) -> None:
        """Memoize the (present, absent) log terms per token once per
        scorer instance — same value, same IEEE ops, same order as the
        oracle's per-expression recomputation."""
        import math

        if self._terms is not None:
            return
        if self._model is None:
            self.load()
        terms: dict[str, tuple[float, float]] = {}
        for w, (m_rel, q_rel, m_non, q_non) in self._model["cnt"].items():
            p_rel = (float(m_rel) + 1.0) / (float(q_rel) + 2.0)
            p_non = (float(m_non) + 1.0) / (float(q_non) + 2.0)
            terms[w] = (
                math.log10(p_rel / p_non),
                math.log10((1.0 - p_rel) / (1.0 - p_non)),
            )
        self._terms = terms

    def score_pairs(
        self, queries: pd.Series, texts: pd.Series
    ) -> pd.DataFrame:
        self._ensure_terms()
        terms = self._terms
        out = []
        for q, t in zip(queries, texts):
            if not isinstance(q, str) or not isinstance(t, str):
                out.append(None)
                continue
            qtoks = list(dict.fromkeys(spark_tokens(q)))
            dset = set(spark_tokens(t))
            lp = 0.0
            for w in qtoks:
                pair = terms.get(w)
                if pair is None:
                    continue  # OOV: contributes nothing
                lp += pair[0] if w in dset else pair[1]
            out.append(lp)
        return pd.DataFrame({"rerank": pd.Series(out, dtype="float64")})
