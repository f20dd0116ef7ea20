"""DSIR-style importance resampling — data selection for LM training.

Method (public: Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS): estimate cheap bag-of-n-gram language
models on a TARGET corpus (the distribution you want more of — e.g.
wiki-quality text) and on the RAW source pool, weight every pool document
by the likelihood ratio p_target(x) / p_source(x), and resample the pool
by those importance weights. The result is a pool-sized-down corpus whose
n-gram statistics move toward the target's without hard filtering.

This implementation composes two already-oracle-exact pieces:

- ``scorers.BigramLMScorer`` — the order-2 interpolated n-gram LM (the
  paper uses hashed bigram features; an interpolated bigram LM is the
  same estimator family), fitted ONCE per corpus as a bounded Spark
  aggregate whose model state travels driver-side.
- ``sampling.weighted_sample_k`` — derandomized Efraimidis-Spirakis
  exact-k weighted sampling without replacement.

100-TB shape: both fits are single bounded aggregates (cap-guarded
distinct-bigram collects — never the corpus); scoring is ONE Arrow
mapInPandas pass evaluating BOTH models per batch (zero shuffles, the
pool is scanned exactly once); the draw is a pure per-row rank-key map
into TakeOrderedAndProject. Nothing here grows with pool size except the
single scan.

Determinism contract (oracle-readiness): both LM scores are the
BigramLMScorer fixed-fold arithmetic (bit-identical to the SQL replay of
fit AND score); the ratio is one IEEE subtract (optionally one divide by
the exact int event count for the length-normalized variant); the weight
is one libm pow(10, x); the draw replays via the md5 60-bit bridge. So
the whole pipeline — two fits, scoring, resampling — is expressible as a
self-contained SQL statement (plans/corpus_r9).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from .scorers import BigramLMScorer, TextScorer, apply_text_scorer, spark_tokens


class DsirRatioScorer(TextScorer):
    """Two-LM importance-ratio scorer for the TextScorer seam: scores each
    document under the target LM and the source LM in ONE pass, emitting
    ``(lp_target, lp_source, log10_ratio, dsir_weight)``.

    ``log10_ratio`` = lp_target - lp_source, divided by the event count
    (n_tokens + 1, the LMs' own perplexity denominator) when
    ``length_normalize`` — the per-token ratio keeps weights inside
    pow(10, ±O(1)) for any document length, where the raw doc-level ratio
    underflows/overflows double for very long documents and couples the
    draw to length. ``dsir_weight`` = 10^log10_ratio, always finite and
    positive for scoreable text. Null/non-string text scores null
    everywhere (zero selection probability downstream, matching
    weighted_sample_k's null-weight exclusion).

    Arithmetic stays scalar per element (CPython float ops = libm), never
    numpy-vectorized: subtract/divide are correctly rounded either way,
    but numpy's SIMD pow can differ from libm pow in the last ulp and the
    weight must replay bit-for-bit in SQL."""

    output_schema = (
        "lp_target double, lp_source double, "
        "log10_ratio double, dsir_weight double"
    )

    def __init__(
        self,
        target: BigramLMScorer,
        source: BigramLMScorer,
        length_normalize: bool = True,
    ):
        self._target = target
        self._source = source
        self.length_normalize = length_normalize

    def load(self) -> None:
        self._target.load()
        self._source.load()

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        self.load()
        lts, lss, ratios, weights = [], [], [], []
        for txt in texts:
            if not isinstance(txt, str):
                lts.append(None)
                lss.append(None)
                ratios.append(None)
                weights.append(None)
                continue
            # tokenize ONCE, score under both models on the token list —
            # the per-document event count falls out for free
            toks = spark_tokens(txt)
            lt = self._target.lp_tokens(toks)
            ls = self._source.lp_tokens(toks)
            r = lt - ls
            if self.length_normalize:
                r = r / float(len(toks) + 1)
            lts.append(lt)
            lss.append(ls)
            ratios.append(r)
            try:
                w = 10.0 ** r
            except OverflowError:
                # CPython raises on double overflow rather than returning
                # inf; an infinite weight is the right degradation (the
                # A-ES rank key ln(u)/inf -> -0.0 sorts such rows first,
                # i.e. an unbounded weight always wins the draw)
                w = float("inf")
            weights.append(w)
        return pd.DataFrame(
            {
                "lp_target": pd.Series(lts, dtype="float64"),
                "lp_source": pd.Series(lss, dtype="float64"),
                "log10_ratio": pd.Series(ratios, dtype="float64"),
                "dsir_weight": pd.Series(weights, dtype="float64"),
            }
        )


def fit_target_source_lms(
    pool: DataFrame,
    target_cond,
    text_col: str = "text",
    lam: float = 0.7,
    max_ngrams: int = 2_000_000,
) -> "tuple[BigramLMScorer, BigramLMScorer]":
    """Fit BOTH LMs from ONE corpus scan when the target is a subset of
    the pool (the common DSIR setup): a single exploded-pair aggregate
    carries the pool count and a conditional count for rows satisfying
    ``target_cond`` (a boolean Column over pool columns); each model then
    builds driver-side from its own count column. Bit-identical to two
    separate ``from_corpus`` fits — a conditional count of zero is
    exactly a bigram absent from the subset — at half the scan cost."""
    if not 0.0 < lam < 1.0:
        raise ValueError("lam must be in (0, 1)")
    rows = BigramLMScorer._bigram_hist(
        pool, text_col, max_ngrams, flags={"tgt": target_cond}
    )
    return (
        BigramLMScorer(model=BigramLMScorer._model_from_hist(rows, "_c_tgt", lam)),
        BigramLMScorer(model=BigramLMScorer._model_from_hist(rows, "_c", lam)),
    )


def dsir_score(
    pool: DataFrame,
    target,
    text_col: str = "text",
    lam: float = 0.7,
    length_normalize: bool = True,
    max_ngrams: int = 2_000_000,
) -> DataFrame:
    """Fit the target LM on ``target`` and the source LM on ``pool``,
    then score every pool document's importance ratio in one Arrow pass.
    All input columns are preserved; appends ``lp_target, lp_source,
    log10_ratio, dsir_weight``.

    ``target`` is either a DataFrame (independent corpus — two fit
    scans) or a boolean Column over pool columns (target ⊆ pool — both
    LMs fit from ONE scan via ``fit_target_source_lms``).

    For a web-scale run, fit the LMs once offline (``BigramLMScorer.save``
    artifacts) and hand a prebuilt ``DsirRatioScorer`` to
    ``apply_text_scorer`` directly — this convenience wrapper refits per
    call."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    if isinstance(target, Column):
        t_lm, s_lm = fit_target_source_lms(
            pool, target, text_col=text_col, lam=lam, max_ngrams=max_ngrams
        )
    else:
        t_lm = BigramLMScorer.from_corpus(
            target, text_col=text_col, lam=lam, max_ngrams=max_ngrams
        )
        s_lm = BigramLMScorer.from_corpus(
            pool, text_col=text_col, lam=lam, max_ngrams=max_ngrams
        )
    scorer = DsirRatioScorer(t_lm, s_lm, length_normalize=length_normalize)
    return apply_text_scorer(
        pool.filter(F.col(text_col).isNotNull()), scorer, text_col=text_col
    )


def dsir_resample(
    pool: DataFrame,
    target,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    length_normalize: bool = True,
    seed: int = 0,
    portable: bool = False,
    max_ngrams: int = 2_000_000,
) -> DataFrame:
    """DSIR end-to-end: score the pool's importance ratios, then draw an
    exact-k sample without replacement with probability proportional to
    ``dsir_weight`` (derandomized A-ES — rerun/retry stable, replayable).
    Returns the selected pool rows with their ratio columns attached.
    ``target`` as in ``dsir_score`` (DataFrame, or boolean Column for the
    single-scan nested-corpus fit)."""
    from .sampling import weighted_sample_k

    scored = dsir_score(
        pool,
        target,
        text_col=text_col,
        lam=lam,
        length_normalize=length_normalize,
        max_ngrams=max_ngrams,
    )
    return weighted_sample_k(
        scored, "dsir_weight", k=k, salt_cols=[id_col], seed=seed,
        portable=portable,
    )
