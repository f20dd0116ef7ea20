"""Property-based tests (hypothesis): the determinism and algebraic claims
the engine's correctness story rests on, checked over random inputs.

Strategy: generate small random datasets driver-side, evaluate the Spark
operator, compare against an independent Python/DuckDB computation. Spark
round-trips are slow, so examples are capped low — these are soundness
probes, not fuzzing campaigns.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bigdata_usaspending_spark.functions import exact_sum
from bigdata_usaspending_spark.operators.dedup import ngram_jaccard_pairs, shingles_of

money = st.decimals(
    min_value=-10_000_000, max_value=10_000_000, places=2, allow_nan=False
).map(float)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(values=st.lists(money, min_size=1, max_size=200), parts=st.integers(1, 8))
@SLOW
@pytest.mark.slow
def test_exact_sum_partition_invariant(spark, values, parts):
    """exact_sum must not depend on partitioning — the property that makes a
    distributed run oracle-verifiable."""
    df = spark.createDataFrame([(v,) for v in values], "v double")
    a = df.repartition(parts).agg(exact_sum("v", "t")).first()["t"]
    b = df.coalesce(1).agg(exact_sum("v", "t")).first()["t"]
    expected = duckdb.sql(
        "SELECT CAST(ROUND(SUM(CAST(v AS DECIMAL(27,6))), 2) AS VARCHAR)::DOUBLE "
        f"FROM (SELECT unnest({values!r}::DOUBLE[]) AS v)"
    ).fetchone()[0]
    assert a == b == expected


words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


@given(docs=st.lists(texts, min_size=2, max_size=8, unique=True))
@SLOW
@pytest.mark.slow
def test_jaccard_matches_python_reference(spark, docs):
    """ngram_jaccard_pairs == brute-force python Jaccard over word trigram
    sets, for every pair above threshold."""
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", threshold=0.0).collect()
    }

    def grams(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for i, a in rows:
        for j, b in rows:
            if i >= j:
                continue
            ga, gb = grams(a), grams(b)
            inter = len(ga & gb)
            if inter == 0:
                assert (i, j) not in got
            else:
                expect = inter / len(ga | gb)
                assert math.isclose(got[(i, j)], expect, rel_tol=0, abs_tol=0)


@given(text=texts)
@SLOW
def test_shingles_match_python(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(shingles_of("text")).first()["shingles"]
    toks = text.lower().split()
    expect = list(dict.fromkeys(" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))))
    assert got == expect


# as-of join: (key, ts) pairs with small integer domains so collisions and
# no-match cases are actually generated
_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=12
)


@given(lefts=_events, rights=_events)
@SLOW
@pytest.mark.slow
def test_asof_join_matches_naive_reference(spark, lefts, rights):
    """asof_join (union + last_value window) == the naive per-row 'latest
    right at-or-before' scan, including no-match nulls and right-ts ties
    (where the max-row_id right row must win)."""
    from bigdata_usaspending_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lefts)],
        "k long, ts long, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, ts, 100 + i) for i, (k, ts) in enumerate(rights)],
        "k long, ts long, rid long",
    )
    got = {
        r.lid: r.rid_r
        for r in asof_join(ldf, rdf, key="k", right_payload=("rid",)).collect()
    }

    for i, (k, ts) in enumerate(lefts):
        candidates = [
            (rts, 100 + j)
            for j, (rk, rts) in enumerate(rights)
            if rk == k and rts <= ts
        ]
        # latest ts wins; ties on ts resolved to the max rid (max_by dedup)
        expect = max(candidates)[1] if candidates else None
        assert got[i] == expect, (i, k, ts, candidates)


@given(
    hash_lists=st.lists(
        st.lists(st.integers(0, (1 << 31) - 2), min_size=0, max_size=40),
        min_size=1,
        max_size=30,
    )
)
@SLOW
@pytest.mark.slow
def test_minhash_family_matches_python_reference(spark, hash_lists):
    """The reduceat kernel behind _minhash_family must equal the obvious
    Python computation: min over hashes of (a_i*h + b_i) mod p per family
    member, p sentinel for empty sets — exact int64 arithmetic, so equality
    is literal."""
    from bigdata_usaspending_spark.operators.dedup import (
        _MINHASH_PRIME,
        minhash_from_hashes,
    )

    num_hashes = 8
    df = spark.createDataFrame(
        [(i, hs) for i, hs in enumerate(hash_lists)], "i long, hs array<bigint>"
    )
    got = {
        r.i: list(r.mh)
        for r in df.select(
            "i", minhash_from_hashes("hs", num_hashes).alias("mh")
        ).collect()
    }
    for i, hs in enumerate(hash_lists):
        base = [h % _MINHASH_PRIME for h in hs]
        expected = [
            min(
                ((x * (2 * j + 1) + (1000003 * j + 12345)) % _MINHASH_PRIME for x in base),
                default=_MINHASH_PRIME,
            )
            for j in range(num_hashes)
        ]
        assert got[i] == expected


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_names = st.text(alphabet="abc", min_size=0, max_size=6)


@given(names=st.lists(_names, min_size=2, max_size=12), k=st.sampled_from([1, 2]))
@SLOW
@pytest.mark.slow
def test_edit_distance_pairs_complete_and_exact(spark, names, k):
    """FastSS blocking must be COMPLETE for levenshtein<=1 (no candidate
    lost to blocking) and the banded verify EXACT (no false pair kept) —
    checked against a quadratic DP reference over adversarially short,
    low-alphabet strings (maximal collision pressure on the variant keys)."""
    from bigdata_usaspending_spark.operators.fuzzy import edit_distance_pairs

    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, "id", "name", max_dist=k).collect()
    }
    want = {
        (i, j, _lev_ref(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev_ref(a, b) <= k
    }
    assert got == want


@given(
    vals=st.lists(
        st.sampled_from([f"w{i}" for i in range(30)]), min_size=1, max_size=400
    ),
    k=st.integers(min_value=2, max_value=12),
    parts=st.integers(min_value=1, max_value=9),
)
@SLOW
@pytest.mark.slow
def test_heavy_hitters_equals_naive_reference(spark, vals, k, parts):
    """The Misra-Gries candidate pass + exact recount must return EXACTLY
    the naive full-GROUP-BY heavy hitters (count*k > total), for any data,
    any k, and any partitioning — the sketch only bounds memory, never
    changes the answer."""
    from collections import Counter

    from bigdata_usaspending_spark.operators.aggregates import heavy_hitters

    df = spark.createDataFrame([(v,) for v in vals], ["v"]).repartition(parts)
    got = {
        (r.v, r.n_occurrences) for r in heavy_hitters(df, "v", k=k).collect()
    }
    counts = Counter(vals)
    total = len(vals)
    expected = {(v, n) for v, n in counts.items() if n * k > total}
    assert got == expected


@given(
    updates=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),           # key
            st.sampled_from(["A", "B", "C", None]),          # attr
        ),
        min_size=0,
        max_size=10,
    )
)
@SLOW
@pytest.mark.slow
def test_scd2_batches_keep_history_invariants(spark, updates):
    """Applying any sequence of update batches one-by-one preserves the
    SCD2 invariants: exactly one open row per key ever seen, closed rows
    never mutate, and each key's open attr equals its LAST update."""
    from datetime import datetime

    from pyspark.sql import types as T

    from bigdata_usaspending_spark.io import scd2_apply

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("attr", T.StringType()),
            T.StructField("eff_from", T.TimestampType()),
            T.StructField("eff_to", T.TimestampType()),
        ]
    )
    hist = spark.createDataFrame([], schema)
    last_attr: dict[int, object] = {}
    for i, (key, attr) in enumerate(updates):
        t = datetime(2020, 1, 1 + i)
        upd = spark.createDataFrame(
            [(key, attr, t)], "k long, attr string, eff_date timestamp"
        )
        hist = scd2_apply(hist, upd, "k", ["attr"])
        last_attr[key] = attr
    rows = hist.collect()
    open_rows = {r.k: r.attr for r in rows if r.eff_to is None}
    assert set(open_rows) == set(last_attr)
    for key, attr in last_attr.items():
        assert open_rows[key] == attr
    # closed intervals are well-formed and non-overlapping per key
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for key, rs in by_key.items():
        closed = sorted(
            [r for r in rs if r.eff_to is not None], key=lambda r: r.eff_from
        )
        for a, b in zip(closed, closed[1:]):
            assert a.eff_to <= b.eff_from
        assert sum(1 for r in rs if r.eff_to is None) == 1


# pure-kernel properties run without Spark, so examples can be generous


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=2000,
    ),
    delta=st.sampled_from([50.0, 100.0, 200.0]),
    split=st.integers(0, 2000),
)
@settings(max_examples=60, deadline=None)
def test_tdigest_compress_invariants(values, delta, split):
    """t-digest kernel invariants over random inputs: total weight is
    conserved, centroids stay sorted and bounded, quantile estimates are
    monotone in q and rank-accurate, and merging a split equals compressing
    each half then folding (the mergeability contract)."""
    import numpy as np

    from bigdata_usaspending_spark.operators.sketches import (
        _compress,
        _digest_quantiles,
    )

    vals = np.asarray(values, dtype=np.float64)
    m, w = _compress(vals, np.ones_like(vals), delta)
    assert w.sum() == pytest.approx(vals.size)
    assert (w > 0).all()
    assert (np.diff(m) >= 0).all(), "centroid means must be sorted"
    assert m.size <= 2 * delta + 2
    assert m.min() >= vals.min() - 1e-9 and m.max() <= vals.max() + 1e-9
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    est = _digest_quantiles(m, w, qs)
    assert (np.diff(est) >= -1e-9).all(), "estimates must be monotone in q"
    # rank accuracy: the estimate must fall inside the exact [q-eps, q+eps]
    # value band; k1 cluster q-width is ~2pi/delta at the center, so allow
    # 2x that
    eps = 2 * (2 * np.pi / delta)
    sv = np.sort(vals)
    for q, e in zip(qs, est):
        lo = sv[max(0, int(np.floor((q - eps) * (vals.size - 1))))]
        hi = sv[min(vals.size - 1, int(np.ceil((q + eps) * (vals.size - 1))))]
        assert lo - 1e-9 <= e <= hi + 1e-9, (q, e, lo, hi)
    # mergeability: halves compressed then folded conserve weight and stay
    # rank-accurate at the median
    cut = min(split, vals.size)
    a, b = vals[:cut], vals[cut:]
    parts = [
        _compress(x, np.ones_like(x), delta) for x in (a, b) if x.size
    ]
    mm, mw = _compress(
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        delta,
    )
    assert mw.sum() == pytest.approx(vals.size)


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 10_000),  # seconds
            st.floats(min_value=0, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=120,
    ),
    gap_s=st.integers(1, 600),
    n_batches=st.integers(1, 4),
)
@settings(max_examples=80, deadline=None)
def test_session_walk_equals_naive_sessionizer(events, gap_s, n_batches):
    """_session_walk fed in arbitrary batch splits must produce the same
    sessions as a naive whole-history sessionizer — PROVIDED batches
    partition the time axis in order (the watermark contract: a later
    batch never carries an event older than a previously closed gap)."""
    from bigdata_usaspending_spark.streaming.jobs import _session_walk

    M = 1_000_000
    pts = sorted((t * M, v) for t, v in events)
    gap_us = gap_s * M
    # naive reference over the full sorted history
    ref = []
    for t, v in pts:
        if not ref or t - ref[-1][1] >= gap_us:
            ref.append([t, t, 1, v])
        else:
            ref[-1][1] = t
            ref[-1][2] += 1
            ref[-1][3] += v
    # feed the walk in n_batches contiguous slices
    closed, cur = [], []
    size = max(1, len(pts) // n_batches)
    for i in range(0, len(pts), size):
        chunk = pts[i : i + size]
        got, cur = _session_walk(
            [t for t, _ in chunk], [v for _, v in chunk], gap_us, cur
        )
        closed.extend(got)
    sessions = closed + ([cur] if cur else [])
    assert len(sessions) == len(ref)
    for s, r in zip(sessions, ref):
        assert s[0] == r[0] and s[1] == r[1] and s[2] == r[2]
        assert s[3] == pytest.approx(r[3])


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=2,
        max_size=30,
    ),
    n_blocks=st.integers(1, 3),
    threshold=st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
)
@SLOW
@pytest.mark.slow
def test_cosine_pairs_blocked_matches_naive_reference(
    spark, vecs, n_blocks, threshold
):
    """The per-block matrix kernel must emit exactly the pairs a naive
    quadratic reference emits — same ids, same fold cosines — for any
    vectors, blocking, and threshold (guards the round-6 join->kernel
    rewrite)."""
    import math

    from bigdata_usaspending_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    rows = [
        (i, i % n_blocks, [float(np.float32(x)) for x in v])
        for i, v in enumerate(vecs)
        # zero-norm vectors divide by zero in both forms; keep the property
        # about the defined domain
        if any(np.float32(x) != 0.0 for x in v)
    ]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs_blocked(
            df, "label", threshold=threshold
        ).collect()
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(np.float64(x) * np.float64(y))
        return acc

    want = {}
    for i, bi, vi in rows:
        for j, bj, vj in rows:
            if i < j and bi == bj:
                c = fold_dot(vi, vj) / (
                    math.sqrt(fold_dot(vi, vi)) * math.sqrt(fold_dot(vj, vj))
                )
                if c >= threshold:
                    want[(i, j)] = c
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


@given(
    docs=st.lists(texts, min_size=1, max_size=8),
    terms=st.lists(words, min_size=1, max_size=3, unique=True),
)
@SLOW
@pytest.mark.slow
def test_bm25_matches_python_reference(spark, docs, terms):
    """bm25_topk == a from-scratch Python Okapi BM25 (Lucene idf) over
    random corpora: same hit set, bit-identical scores (both sides do
    exact-int stats + libm ln + a fixed left-to-right double tree)."""
    from bigdata_usaspending_spark.operators.text import bm25_topk

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_topk(df, terms, k=100).collect()}

    # independent reference (spark_tokens replica is pinned elsewhere)
    toks = {i: t.lower().strip(" ").split(" ") if t else [""] for i, t in rows}
    # NB: "a b".split(" ") on our generated texts (single spaces) matches
    # the JVM split; empty text tokenizes to [""] exactly like split does
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    want = {}
    for i, tk in toks.items():
        score = 0.0
        for term in terms:
            tf = float(tk.count(term))
            dfreq = float(sum(1 for v in toks.values() if term in v))
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            score += (
                idf
                * (tf * (k1 + 1.0))
                / (tf + k1 * ((1.0 - b) + b * len(tk) / avgdl))
            )
        if score > 0:
            want[i] = score
    assert got == want


@given(
    seed=st.integers(0, 2**31 - 1),
    n_a=st.integers(1, 10),
    n_b=st.integers(1, 10),
)
@SLOW
@pytest.mark.slow
def test_rrf_invariant_under_monotone_score_transform(spark, seed, n_a, n_b):
    """RRF depends only on RANKS: applying a strictly increasing transform
    to either list's scores must leave the fused output IDENTICAL (exact
    doubles, not approx) — the calibration-free property that justifies
    rank fusion over score mixing."""
    import random

    from bigdata_usaspending_spark.operators.retrieval import rrf_fuse

    rng = random.Random(seed)
    ids_a = rng.sample(range(100), n_a)
    ids_b = rng.sample(range(100), n_b)
    a = spark.createDataFrame(
        [(i, rng.uniform(-5, 5)) for i in ids_a], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(i, rng.uniform(0, 1)) for i in ids_b], "doc_id long, score double"
    )
    base = [
        (r.doc_id, r.rrf, r.n_lists) for r in rrf_fuse([a, b], k=50).collect()
    ]
    a2 = a.withColumn("score", F.exp(F.col("score")) * 3.0 + 7.0)
    b2 = b.withColumn("score", F.pow(F.col("score"), 3) - 100.0)
    transformed = [
        (r.doc_id, r.rrf, r.n_lists)
        for r in rrf_fuse([a2, b2], k=50).collect()
    ]
    assert base == transformed


@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(2, 12),
    n_langs=st.integers(2, 4),
)
@SLOW
@pytest.mark.slow
def test_trigram_langid_matches_python_reference(spark, seed, n_docs, n_langs):
    """TrigramLangIdScorer (fit + argmax scoring) must equal a from-scratch
    Python reference — independent trigram counting, add-one smoothing,
    scalar log10 fold in position order, ascending-language ties."""
    import math
    import random
    from collections import Counter

    import pandas as pd

    from bigdata_usaspending_spark.operators.scorers import TrigramLangIdScorer

    rng = random.Random(seed)
    langs = [f"l{i}" for i in range(n_langs)]
    alphabet = "abcdef "
    rows = [
        (
            i,
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))),
            rng.choice(langs),
        )
        for i in range(n_docs)
    ]
    # the model needs at least one trigram event to exist
    rows[0] = (rows[0][0], rows[0][1] + "abc", rows[0][2])
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    scorer = TrigramLangIdScorer.from_corpus(df)
    out = scorer.score_batch(pd.Series([t for _, t, _ in rows]))

    # independent reference
    cnt: dict[str, Counter] = {}
    for _, t, lang in rows:
        tris = [t[i : i + 3] for i in range(len(t) - 2)]
        if tris:  # a lang with zero trigram events is absent from the model
            cnt.setdefault(lang, Counter()).update(tris)
    vocab = set().union(*[set(c) for c in cnt.values()]) if cnt else set()
    for j, (_, t, _) in enumerate(rows):
        tris = [t[i : i + 3] for i in range(len(t) - 2)]
        best_lang, best_lp = None, None
        for lang in sorted(cnt):
            d = float(sum(cnt[lang].values())) + (float(len(vocab)) + 1.0)
            lp = 0.0
            for tri in tris:
                lp += math.log10((float(cnt[lang].get(tri, 0)) + 1.0) / d)
            if best_lp is None or lp > best_lp:
                best_lang, best_lp = lang, lp
        assert out["lang_model"][j] == best_lang
        assert out["lp_model"][j] == best_lp


@given(
    seed=st.integers(0, 2**31 - 1),
    n_hits=st.integers(1, 40),
    list_k=st.integers(1, 5),
    k=st.integers(1, 5),
)
@SLOW
@pytest.mark.slow
def test_rrf_grouped_tagged_matches_python_reference(
    spark, seed, n_hits, list_k, k
):
    """The tagged grouped fusion must equal a from-scratch Python RRF:
    per-(group, list) ranks on (score DESC, id ASC) truncated at list_k,
    contributions folded in list-index order, per-group top-k on
    (rrf DESC, id ASC)."""
    import random

    from bigdata_usaspending_spark.operators.retrieval import (
        rrf_fuse_grouped_tagged,
    )

    rng = random.Random(seed)
    rows = {
        (rng.choice(["g1", "g2"]), rng.randrange(20), rng.randrange(3))
        for _ in range(n_hits)
    }
    hits = [(g, d, li, rng.choice([0.25, 0.5, 0.75, 1.0])) for g, d, li in rows]
    df = spark.createDataFrame(
        hits, "query_id string, doc_id long, list_idx int, score double"
    )
    got = [
        (r.query_id, r.doc_id, r.rrf, r.n_lists)
        for r in rrf_fuse_grouped_tagged(df, list_k=list_k, k=k).collect()
    ]

    # reference
    contribs: dict[tuple, list] = {}
    for (g, li) in {(g, li) for g, _, li, _ in hits}:
        members = sorted(
            [h for h in hits if h[0] == g and h[2] == li],
            key=lambda h: (-h[3], h[1]),
        )[:list_k]
        for rank, (_, d, _, _) in enumerate(members, start=1):
            contribs.setdefault((g, d), []).append((li, 1.0 / (60.0 + rank)))
    fused = {}
    for (g, d), cs in contribs.items():
        lp = 0.0
        for _, c in sorted(cs):
            lp += c
        fused[(g, d)] = (lp, len(cs))
    want = []
    for g in sorted({g for g, _ in fused}):
        grp = sorted(
            [(d, v[0], v[1]) for (gg, d), v in fused.items() if gg == g],
            key=lambda x: (-x[1], x[0]),
        )[:k]
        want.extend((g, d, rrf, n) for d, rrf, n in grp)
    assert got == want


@given(
    doc=st.lists(
        st.text(alphabet="abcde ", min_size=0, max_size=40), max_size=3
    ).map(" ".join),
    mx=st.integers(1, 7),
    ov=st.integers(0, 6),
)
@SLOW
def test_chunk_spans_reconstructs_and_covers(spark, doc, mx, ov):
    """chunk_spans invariants on arbitrary text/window/overlap: chunk
    texts are exactly the token slices at their offsets, consecutive
    starts advance by the stride, every token is covered, and dropping
    each chunk's first `overlap` tokens (after the first chunk)
    reconstructs the full token stream."""
    from bigdata_usaspending_spark.operators.text import chunk_spans

    if ov >= mx:
        ov = mx - 1
    stride = mx - ov
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    rows = sorted(
        (
            (r.c.chunk_id, r.c.start_tok, r.c.n_tok, r.c.chunk_text)
            for r in df.select(
                F.explode(chunk_spans("text", mx, ov)).alias("c")
            ).select("c").collect()
        )
    )
    toks = doc.lower().strip().split() or [""]
    n = len(toks)
    assert rows[0][:2] == (0, 0) and len(rows) >= 1
    recon = []
    for cid, start, ln, text in rows:
        assert start == cid * stride and ln == min(mx, n - start) and ln >= 1
        assert text == " ".join(toks[start : start + ln])
        recon.extend(toks[start:start + ln][ov if cid else 0:] if cid else toks[:ln])
    # the last chunk ends at the last token; reconstruction is exact
    assert rows[-1][1] + rows[-1][2] == n
    assert recon == toks
