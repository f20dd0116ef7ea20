"""Tests for DSIR importance resampling (operators/dsir)."""

from __future__ import annotations

import pandas as pd
import pytest

from bigdata_usaspending_spark.operators.dsir import (
    DsirRatioScorer,
    dsir_resample,
    dsir_score,
)
from bigdata_usaspending_spark.operators.scorers import BigramLMScorer


def _corpus(spark):
    """Pool = 6 target-like docs (vocab A) + 6 off-target docs (vocab B);
    target = the A docs. Importance weights must separate the two."""
    a = ["the cat sat", "the dog sat", "the cat ran", "the dog ran",
         "a cat sat", "a dog ran"]
    b = ["zz yy xx", "yy xx ww", "xx ww zz", "ww zz yy", "zz xx yy",
         "ww yy zz"]
    rows = [(i, t, "A") for i, t in enumerate(a)] + [
        (100 + i, t, "B") for i, t in enumerate(b)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, grp string")


def test_dsir_weights_separate_target_from_off_target(spark):
    pool = _corpus(spark)
    target = pool.filter("grp = 'A'")
    scored = dsir_score(pool, target).toPandas().set_index("doc_id")
    a_w = scored[scored["grp"] == "A"]["dsir_weight"]
    b_w = scored[scored["grp"] == "B"]["dsir_weight"]
    assert a_w.min() > b_w.max()
    assert (scored["dsir_weight"] > 0).all()
    # ratio column is consistent with the two lp columns and the event
    # count (n_tokens + 1 = 4 for every 3-token doc here)
    got = scored["log10_ratio"]
    want = (scored["lp_target"] - scored["lp_source"]) / 4.0
    assert (got == want).all()
    # scalar pow per element: the scorer pins libm pow (numpy's SIMD pow
    # can differ in the last ulp, which is the point of the contract)
    assert all(
        w == 10.0 ** r for w, r in zip(scored["dsir_weight"], got)
    )


def test_dsir_scorer_raw_ratio_and_null_handling(spark):
    pool = _corpus(spark)
    target = pool.filter("grp = 'A'")
    t_lm = BigramLMScorer.from_corpus(target)
    s_lm = BigramLMScorer.from_corpus(pool)
    raw = DsirRatioScorer(t_lm, s_lm, length_normalize=False)
    out = raw.score_batch(pd.Series(["the cat sat", None, 42]))
    lt = t_lm.score_batch(pd.Series(["the cat sat"]))["log10_prob"][0]
    ls = s_lm.score_batch(pd.Series(["the cat sat"]))["log10_prob"][0]
    assert out["log10_ratio"][0] == lt - ls
    assert out["dsir_weight"][0] == 10.0 ** (lt - ls)
    # null / non-string text scores null across the board
    assert out["log10_ratio"][1:].isna().all()
    assert out["dsir_weight"][1:].isna().all()


@pytest.mark.slow
def test_dsir_resample_shifts_mix_and_is_deterministic(spark):
    pool = _corpus(spark)
    target = pool.filter("grp = 'A'")
    draw = dsir_resample(pool, target, k=6, seed=3)
    rows = draw.collect()
    assert len(rows) == 6
    picked = [r.grp for r in rows]
    # weights separate by orders of magnitude, so the draw should be
    # dominated by target-like docs
    assert picked.count("A") >= 5
    # derandomized: the same seed reproduces the same set; the scored
    # columns ride along
    again = dsir_resample(pool, target, k=6, seed=3).collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in again}
    assert {"lp_target", "lp_source", "log10_ratio", "dsir_weight"} <= set(
        draw.columns
    )


@pytest.mark.slow
def test_dsir_resample_portable_matches_xxhash_semantics(spark):
    """portable=True (oracle bridge) and the xxhash64 production path
    draw from the same weight distribution — both must return exactly k
    rows with positive weights; sets may differ (different hash), but
    each is internally deterministic."""
    pool = _corpus(spark)
    target = pool.filter("grp = 'A'")
    for portable in (False, True):
        got = dsir_resample(
            pool, target, k=4, seed=9, portable=portable
        ).collect()
        assert len(got) == 4
        assert all(r.dsir_weight > 0 for r in got)
        rerun = dsir_resample(
            pool, target, k=4, seed=9, portable=portable
        ).collect()
        assert {r.doc_id for r in got} == {r.doc_id for r in rerun}


def test_fused_pair_fit_is_bit_identical_to_two_fits(spark):
    """fit_target_source_lms (one conditional-count scan) must produce
    models EQUAL to two independent from_corpus fits — a conditional
    count of zero is exactly a bigram absent from the subset."""
    from pyspark.sql import functions as F

    from bigdata_usaspending_spark.operators.dsir import fit_target_source_lms

    pool = _corpus(spark)
    t_fused, s_fused = fit_target_source_lms(pool, F.col("grp") == "A")
    t_sep = BigramLMScorer.from_corpus(pool.filter("grp = 'A'"))
    s_sep = BigramLMScorer.from_corpus(pool)
    assert t_fused._model == t_sep._model
    assert s_fused._model == s_sep._model
    # and dsir_score with a Column target routes through the fused path
    # with identical output to the DataFrame target path
    via_col = dsir_score(pool, F.col("grp") == "A").toPandas()
    via_df = dsir_score(pool, pool.filter("grp = 'A'")).toPandas()
    a = via_col.sort_values("doc_id").reset_index(drop=True)
    b = via_df.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_dsir_scorer_guards(spark):
    pool = _corpus(spark)
    with pytest.raises(ValueError, match="lam"):
        dsir_score(pool, pool.filter("grp = 'A'"), lam=1.2)


@pytest.mark.slow
def test_dsir_scorer_streams_bit_identically(spark, tmp_path):
    """DsirRatioScorer rides the scorer seam on a readStream unchanged
    (stateless Arrow map) — the production shape for scoring an incoming
    crawl against frozen target/source LMs. Stream scores must match the
    batch path bit-for-bit."""
    from bigdata_usaspending_spark.operators.scorers import apply_text_scorer
    from bigdata_usaspending_spark.streaming import jobs

    pool = _corpus(spark)
    target = pool.filter("grp = 'A'")
    scorer = DsirRatioScorer(
        BigramLMScorer.from_corpus(target), BigramLMScorer.from_corpus(pool)
    )
    path = str(tmp_path / "pool")
    pool.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema
    ).parquet(path)
    q = jobs.run_to_memory(
        apply_text_scorer(stream.filter("text IS NOT NULL"), scorer).select(
            "doc_id", "log10_ratio", "dsir_weight"
        ),
        "dsir_stream",
        output_mode="append",
    )
    got = {
        r.doc_id: (r.log10_ratio, r.dsir_weight)
        for r in spark.table("dsir_stream").collect()
    }
    want = {
        r.doc_id: (r.log10_ratio, r.dsir_weight)
        for r in apply_text_scorer(pool, scorer)
        .select("doc_id", "log10_ratio", "dsir_weight")
        .collect()
    }
    assert got == want and len(got) == 12
    q.stop()
