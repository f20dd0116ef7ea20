"""Extension query corpus: training-data-pipeline operators over the
documents / embeddings / events tables (SURVEY.md §7.4; FIXTURES.md §B).

Same determinism contract as plans/corpus.py. Ratio/score columns are raw
IEEE divisions of exactly-computed integers (no rounding), so any engine
reproduces them bit-for-bit; cosine/dot products accumulate in exact decimal.

Hash-based approximate operators (MinHash LSH, SimHash, RP-LSH ANN) run
their portable-hash variants here so every stage is replayable in SQL.
q_ann_lsh (MLlib's JVM-private RNG) follows the audit contract since
round 6: exact euclidean top-k witness + a pinned recall boolean — no
rows-only queries remain in this module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import exact_sum
from ..operators import dedup, similarity, text
from ..session import apply_runtime_confs

JACCARD_THRESHOLD = 0.5
COSINE_PAIR_THRESHOLD = 0.3


def _prep(spark: SparkSession) -> SparkSession:
    return apply_runtime_confs(spark)


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

def q_text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex pre-tokenizer."""
    docs = load(_prep(spark), sf, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text", "n_tokens"),
        text.bpe_ish_token_count("text", "n_bpe_tokens"),
    )


def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-score components: char/token counts, stopword & punctuation
    ratios (raw divisions — deterministic doubles)."""
    docs = load(_prep(spark), sf, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars"),
        text.token_count("text", "n_tokens"),
        text.stopword_ratio("text").alias("stopword_ratio"),
        text.punct_ratio("text").alias("punct_ratio"),
    )


def q_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Marker-stopword-voting language ID."""
    docs = load(_prep(spark), sf, "documents")
    return docs.select("doc_id", text.langid("text"))


def q_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """md5 fingerprint of normalized text — the exact-dedup key."""
    docs = load(_prep(spark), sf, "documents")
    return docs.select("doc_id", text.fingerprint("text"))


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------

def q_text_commonness(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-frequency quality score (LM-free perplexity stand-in)."""
    docs = load(_prep(spark), sf, "documents")
    return text.commonness_scores(docs)


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup groups: canonical min-id + copy count per distinct
    normalized text."""
    docs = load(_prep(spark), sf, "documents")
    return dedup.exact_dedup_groups(docs, "doc_id").select("doc_id", "n_copies")


def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard >= 0.5."""
    docs = load(_prep(spark), sf, "documents")
    out = dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=JACCARD_THRESHOLD)
    # raw (unrounded) jaccard is computed inside; re-derive without rounding
    return out


def q_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, fully oracle-checked: the portable
    md5-derived shingle hash (dedup.portable_hash60) makes every stage —
    affine minhash family, banded candidate join, exact-Jaccard verify —
    reproducible in plain SQL. Production callers keep the xxhash64 default."""
    docs = load(_prep(spark), sf, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", threshold=JACCARD_THRESHOLD, portable=True
    )


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs at hamming <= 3, fully oracle-checked via the
    portable 60-bit token hash (bit-votes, pigeonhole banding and
    bit_count(xor) are all plain SQL)."""
    docs = load(_prep(spark), sf, "documents")
    return dedup.simhash_pairs(docs, "doc_id", max_hamming=3, portable=True)


def q_text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-token fraction +
    top-bigram occurrence fraction per document."""
    docs = load(_prep(spark), sf, "documents")
    return text.repetition_metrics(docs)


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components (min-label propagation) over
    the exact 3-gram Jaccard near-dup pairs — the step that turns pairwise
    near-dup output into per-document canonical ids (chains A~B~C collapse
    to one cluster even when A~C was never emitted)."""
    docs = load(_prep(spark), sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=JACCARD_THRESHOLD)
    # the dup graph is tiny relative to the corpus: size the per-round
    # shuffles to the pair volume (see connected_components docstring)
    return dedup.connected_components(pairs, out_col="doc_id", num_partitions=4)


def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 20 == 0 play the eval
    benchmark; every remaining corpus doc sharing a 3-gram shingle with any
    benchmark doc is dropped (broadcast semi-join on the tiny benchmark
    shingle set — the GPT-3/Llama training-hygiene step)."""
    docs = load(_prep(spark), sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    return dedup.decontaminate(corpus, benchmark, "doc_id", portable=True).select(
        "doc_id", "lang", "source"
    )


def q_dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.3 within label blocks."""
    emb = load(_prep(spark), sf, "embeddings")
    return similarity.cosine_pairs_blocked(
        emb, "label", threshold=COSINE_PAIR_THRESHOLD
    )


SEMANTIC_DEDUP_THRESHOLD = 0.4


def q_dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic dedup (similarity.semantic_dedup): cluster
    every embedding to its nearest deterministic label-mean centroid,
    cosine-compare ONLY within clusters, keep the min-id survivor of each
    >= 0.4 pair. The scale path for embedding dedup — pairwise cost is
    quadratic only inside clusters, assignment is a broadcast-centroid
    pass. The rank-window assignment here is the oracle-replayable twin of
    the production fold (same argument as q_ann_ivf_topk)."""
    spark = _prep(spark)
    emb = load(spark, sf, "embeddings")
    cent = _ivf_centroids(emb)
    assigned = _assign_by_rank(emb, cent)
    return similarity.semantic_dedup(
        emb, cent, threshold=SEMANTIC_DEDUP_THRESHOLD, assigned=assigned
    )


def q_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental exact dedup (dedup.dedup_against_index): docs with
    doc_id % 3 == 0 play the already-ingested corpus whose fingerprint
    index is persistent; the rest arrive as a new batch. Survivors = batch
    docs whose fingerprint is unseen, one min-id winner per within-batch
    duplicate group — the per-ingest dedup step that never re-scans the
    corpus at 100 TB."""
    spark = _prep(spark)
    docs = load(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    index = dedup.fingerprint_index(corpus)
    return dedup.dedup_against_index(batch, index, "doc_id").select(
        "doc_id", "lang", "source"
    )


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

def _query_vec(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))


def _query_vec_list(emb: DataFrame) -> list:
    """The query vector as a plain Python list — ONE explicit bounded
    collect here in the plan function; the similarity operators then build
    their plans without firing any metadata/probe job (round-4 verdict #5).
    Bit-exact: float32 widens to binary64 losslessly."""
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(x) for x in row[0]]


def q_embedding_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force exact cosine top-10 against the vec_id=0 query vector."""
    emb = load(_prep(spark), sf, "embeddings")
    return similarity.brute_force_topk(
        emb.filter(F.col("vec_id") != 0), _query_vec_list(emb), k=10
    )


def q_maxsim_topk(spark: SparkSession, sf: str) -> DataFrame:
    """ColBERT-style MaxSim late-interaction top-10
    (similarity.maxsim_topk): embeddings treated as 4 concatenated
    16-dim token vectors; score = sum over query tokens of the max cosine
    against any document token. Explode + one keyed max-aggregation +
    TakeOrdered — fully replayable SQL (slices, fold cosines, MAX, and the
    token-ascending sum all reproduce in DuckDB)."""
    spark = _prep(spark)
    emb = load(spark, sf, "embeddings")
    return similarity.maxsim_topk(
        emb.filter(F.col("vec_id") != 0), _query_vec_list(emb), n_tokens=4, k=10
    )


def _ivf_centroids(emb: DataFrame) -> DataFrame:
    """Label-mean centroids via similarity.mean_centroids (deterministic
    decimal-mean — see its docstring). Output: (cell, centroid)."""
    return similarity.mean_centroids(
        emb.select(F.col("label").alias("cell"), "embedding")
    )


def _assign_by_rank(data: DataFrame, centroids: DataFrame) -> DataFrame:
    """Deterministic cell assignment: since round 4 this IS the production
    operator (similarity.ivf_assign — Arrow-vectorized argmax over
    driver-side centroids, ties to the lowest cell), whose output is
    bit-identical to the SQL rank-window the oracle replays (cosine DESC,
    cell ASC over the same left-fold cosines). The former crossJoin +
    row_number window twin paid a C-fold row expansion plus a per-vector
    shuffle for the same answer."""
    return similarity.ivf_assign(data, centroids)


def _probe_and_search(
    assigned: DataFrame, centroids: DataFrame, q: DataFrame, nprobe: int = 3
) -> DataFrame:
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select("cell", similarity.cosine(F.col("centroid"), F.col("q_emb")).alias("_qs"))
        .orderBy(F.desc("_qs"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    candidates = assigned.join(F.broadcast(probe), on="cell", how="semi")
    return similarity.brute_force_topk(candidates, q, k=10)


def q_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN top-10: deterministic label-mean centroids, rank-window cell
    assignment, nprobe=3 probed cells, exact cosine within candidates.
    Oracle-checked: every stage is reproducible SQL (see corpus_ext
    ORACLE_SQL)."""
    spark = _prep(spark)
    emb = load(spark, sf, "embeddings")
    centroids = _ivf_centroids(emb)
    data = emb.filter(F.col("vec_id") != 0)
    assigned = _assign_by_rank(data, centroids)
    return _probe_and_search(assigned, centroids, _query_vec(emb))


def q_ann_ivf_refined(spark: SparkSession, sf: str) -> DataFrame:
    """IVF with ONE Lloyd refinement iteration (the k-means training step,
    oracle-checked end-to-end): assign to label-mean centroids, recompute
    centroids as member means (similarity.mean_centroids — deterministic
    decimal means), re-assign, probe, search. Demonstrates that even the
    iterative-training path is replayable by an external engine."""
    spark = _prep(spark)
    emb = load(spark, sf, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    cent0 = _ivf_centroids(emb)
    assigned1 = _assign_by_rank(data, cent0)
    cent1 = similarity.mean_centroids(assigned1)
    assigned2 = _assign_by_rank(data, cent1)
    return _probe_and_search(assigned2, cent1, _query_vec(emb))


def q_ann_rp_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Random-projection LSH ANN with multi-probe (±1 adjacent buckets),
    fully oracle-checked: the projection matrix derives from the portable
    md5 hash (similarity.rp_weight), so bucketing, probing, and the final
    exact-cosine top-k are all replayable in SQL — unlike the MLlib LSH
    whose JVM RNG keeps q_ann_lsh rows-only."""
    spark = _prep(spark)
    emb = load(spark, sf, "embeddings")
    return similarity.rp_lsh_topk(
        emb.filter(F.col("vec_id") != 0), _query_vec_list(emb),
        k=10, num_tables=8, bucket_length=0.25, multiprobe=1,
    )


PQ_M = 16          # subspaces (dsub = 64/16 = 4)
PQ_K = 16          # centroids per subspace
PQ_RERANK = 8      # candidate pool = k * PQ_RERANK


def q_ann_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN top-10 (similarity.pq_train/pq_encode/
    pq_topk): 16 subspaces x 16 deterministic centroids — equal-width
    projection init + ONE per-subspace Lloyd iteration — codes by argmin-L2,
    ADC scan over the broadcast query distance table, exact squared-L2
    rerank of the top 80. Every stage — projection binning, decimal-mean
    codebooks, the Lloyd re-assignment, the sub-ordered ADC fold, the
    rerank — is replayable SQL (the refinement iteration is generated as a
    CTE pair in the oracle)."""
    spark = _prep(spark)
    emb = load(spark, sf, "embeddings")
    data = emb.filter(F.col("vec_id") != 0)
    # Codebook training runs driver-side on the (bounded) training set — the
    # faiss-style production shape, bit-identical to the distributed
    # pq_train (verified both paths at sf0.01/sf0.1) but one collect job
    # instead of 2+2*iters distributed jobs (round-3 finding: the lazy
    # codebook subtree re-ran per consumer, 13 s at sf0.1). dsub threaded
    # explicitly so no metadata .first() probes fire.
    dsub = 64 // PQ_M
    # _bounded_train_frame caps the driver-side training collect at the
    # faiss-style sample size (identity at parity SFs, so oracle hashes
    # are unchanged; over the cap it switches to the deterministic
    # hash_sample instead of collecting the corpus) — the plan shape
    # that survives a 100x scale-up.
    cb = similarity.pq_train_driver(
        similarity._bounded_train_frame(data, "vec_id", 65_536),
        m=PQ_M, k=PQ_K, refine_iterations=1,
    )
    enc = similarity.pq_encode(data, cb, dsub=dsub)
    return similarity.pq_topk(
        enc, cb, _query_vec_list(emb), k=10, rerank_factor=PQ_RERANK, dsub=dsub
    )


def q_ann_quantized(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage int8-quantized ANN: exact-int64 cosine over 4x-smaller
    quantized codes prunes to k*4 candidates, float rerank returns top-10.
    Fully oracle-checked — quantization (floor(x*scale+0.5)), int dots and
    the rerank are all engine-portable arithmetic."""
    spark = _prep(spark)
    emb = load(spark, sf, "embeddings")
    return similarity.quantized_topk(
        emb.filter(F.col("vec_id") != 0), _query_vec_list(emb), k=10
    )


def q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """BucketedRandomProjectionLSH approxNearestNeighbors via the audit
    contract (similarity.rp_lsh_recall_audit): MLlib's JVM-private RNG
    makes the approximate result itself non-portable, so the query emits
    the EXACT euclidean top-10 witness (fold distances, bit-identical in
    DuckDB) plus recall_ok — TRUE iff the seeded LSH neighbors hit >= 80%
    of the exact set. Fully value-verified; the former rows-only check is
    retired."""
    spark = _prep(spark)
    emb = load(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.rp_lsh_recall_audit(
        emb.filter(F.col("vec_id") != 0), qvec, k=10
    )


def q_training_data_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The capstone composition — a full training-data preprocessing run as
    ONE oracle-checked dataflow: quality filters (token count, punctuation
    ratio) -> language-ID gate -> exact dedup (min-id survivor per
    fingerprint) -> deterministic 50% hash sample. Every stage is a pure
    map or one hash shuffle; the whole pipeline is replayable bit-for-bit
    by an external engine, which is the auditability property a real
    training-data pipeline needs."""
    from pyspark.sql import Window

    from ..operators.sampling import hash_gate

    docs = load(_prep(spark), sf, "documents")
    quality = docs.select(
        "doc_id",
        "text",
        text.token_count("text", "n_tokens"),
        text.punct_ratio("text").alias("punct_ratio"),
        text.langid("text"),
    ).filter(
        (F.col("n_tokens") >= 5)
        & (F.col("punct_ratio") < 0.25)
        & (F.col("lang_pred") == "en")
    )
    w = Window.partitionBy(text.fingerprint("text")).orderBy(F.asc("doc_id"))
    survivors = (
        quality.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "text")
    )
    return survivors.filter(hash_gate("doc_id", 50)).select(
        "doc_id", "n_tokens", "lang_pred"
    )


# --------------------------------------------------------------------------
# event-time operators (batch form of the streaming rollups)
# --------------------------------------------------------------------------

def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk sequence packing (budget 512): per document, the
    training sequence and offset where its first token lands. Runs the
    scalable two-pass prefix sum (range partitions + broadcast partition
    offsets) — the single-partition-window formulation it replaces is the
    oracle's SUM() OVER (ORDER BY), and both agree exactly."""
    from ..operators.sampling import pack_sequences

    docs = load(_prep(spark), sf, "documents")
    with_tokens = docs.select("doc_id", text.token_count("text", "n_tokens"))
    return pack_sequences(with_tokens, "doc_id", "n_tokens", budget=512, num_partitions=8)


def q_window_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-day event-time window aggregate (batch equivalent of the
    streaming rollup in streaming/)."""
    ev = load(_prep(spark), sf, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value", "total_value"),
    )


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization: per-user sessions split at >30-minute gaps; one row
    per session with event count and duration (lag + cumulative-sum windows)."""
    from pyspark.sql import Window

    ev = load(_prep(spark), sf, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ms") - F.lag("ms", 1).over(w) > 30 * 60 * 1000, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max("ms") - F.min("ms")).cast("double") / 1000.0).alias("duration_s"),
    )


def q_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization via the NATIVE session-window operator
    (F.session_window, gap 30 min): one shuffle on user_id with in-partition
    session merging, versus the two-pass lag + cumulative-sum formulation of
    q_sessionize (window shuffle + re-agg shuffle). Batch twin of
    streaming/jobs.stream_sessionize, so batch backfill and the streaming
    job share one session definition. Boundary semantics are the operator's:
    a session's end is exclusive, so a gap >= the timeout opens a new
    session (q_sessionize's hand-rolled flag uses strict >)."""
    ev = load(_prep(spark), sf, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sess"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).cast(
                    "double"
                )
                / 1000000.0
            ).alias("duration_s"),
        )
        .select(
            "user_id",
            F.unix_micros("sess.start").alias("session_start_us"),
            "n_events",
            "duration_s",
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_text_tokens": q_text_tokens,
    "q_text_quality": q_text_quality,
    "q_text_langid": q_text_langid,
    "q_text_commonness": q_text_commonness,
    "q_text_repetition": q_text_repetition,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_clusters": q_dedup_clusters,
    "q_decontaminate": q_decontaminate,
    "q_dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "q_dedup_minhash_lsh": q_dedup_minhash_lsh,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_embedding": q_dedup_embedding,
    "q_dedup_semantic": q_dedup_semantic,
    "q_dedup_incremental": q_dedup_incremental,
    "q_embedding_cosine_topk": q_embedding_cosine_topk,
    "q_maxsim_topk": q_maxsim_topk,
    "q_ann_ivf_topk": q_ann_ivf_topk,
    "q_ann_ivf_refined": q_ann_ivf_refined,
    "q_ann_rp_lsh": q_ann_rp_lsh,
    "q_ann_pq_topk": q_ann_pq_topk,
    "q_ann_quantized": q_ann_quantized,
    "q_ann_lsh": q_ann_lsh,
    "q_training_data_pipeline": q_training_data_pipeline,
    "q_pack_sequences": q_pack_sequences,
    "q_window_tumbling": q_window_tumbling,
    "q_sessionize": q_sessionize,
    "q_session_window": q_session_window,
}

ROWS_ONLY_QUERIES: set[str] = set()  # q_ann_lsh audit-contracted in r6

# DuckDB twins ------------------------------------------------------------

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"
_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)
_NORMALIZED = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_MARKER_SQL = {
    lang: "len(list_filter(" + _TOKS + ", t -> t IN ({})))".format(
        ", ".join(f"'{m}'" for m in markers)
    )
    for lang, markers in text.LANG_MARKERS.items()
}

_LANGID_CASE = (
    "CASE WHEN greatest({en}, {de}, {es}, {fr}) = 0 THEN 'und' "
    "WHEN {en} = greatest({en}, {de}, {es}, {fr}) THEN 'en' "
    "WHEN {de} = greatest({en}, {de}, {es}, {fr}) THEN 'de' "
    "WHEN {es} = greatest({en}, {de}, {es}, {fr}) THEN 'es' "
    "WHEN {fr} = greatest({en}, {de}, {es}, {fr}) THEN 'fr' "
    "ELSE 'und' END"
).format(**_MARKER_SQL)

# Sequential left-fold dot product — DuckDB's list_reduce folds
# left-to-right exactly like Spark's aggregate HOF, and float32 products are
# exact doubles, so every intermediate double matches Spark bit-for-bit.
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        "(acc, v) -> acc + v)"
    )


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    )


def _l2_sql(a: str, b: str) -> str:
    """Twin of similarity.l2sq: sequential left-fold squared L2 (list_reduce
    folds left like Spark's aggregate; 0.0 + x == x, so the missing init is
    harmless)."""
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
        "(acc, v) -> acc + v)"
    )


def _euclid_sql(a: str, b: str) -> str:
    """Twin of similarity.euclidean_to_query_kernel: sqrt of the left-fold
    of squared diffs."""
    return f"sqrt({_l2_sql(a, b)})"


def _pq_means_sql(src: str) -> str:
    """Decimal-mean subspace centroids over a (s, cell, v) source — the SQL
    twin of similarity._subspace_means."""
    return f"""SELECT s, cell, list(mv ORDER BY pos) AS centroid FROM (
        SELECT s, cell, pos,
               CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,7))) AS VARCHAR)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mv
        FROM (SELECT s, cell, unnest(v) AS x, generate_subscripts(v, 1) AS pos
              FROM {src})
        GROUP BY s, cell, pos) GROUP BY s, cell"""


def _pq_encode_sql(cent: str) -> str:
    """argmin-L2 code assignment of every subvector against codebook CTE
    ``cent`` — the SQL twin of similarity.pq_encode (ties -> lowest cell,
    matching the fold's strict-< over the cell-sorted centroid array)."""
    return f"""SELECT vec_id, s, cell FROM (
        SELECT b.vec_id, b.s, c.cell,
               row_number() OVER (PARTITION BY b.vec_id, b.s
                                  ORDER BY {_l2_sql('b.v', 'c.centroid')} ASC,
                                           c.cell ASC) AS rn
        FROM sub b JOIN {cent} c ON b.s = c.s) WHERE rn = 1"""


def _pq_oracle_sql() -> str:
    """Full PQ ANN oracle: equal-width projection init -> decimal-mean
    codebooks -> one Lloyd iteration (re-encode + re-mean) -> final encode
    -> ADC (sub-ordered fold) -> exact rerank. Mirrors q_ann_pq_topk's
    PQ_M=16 x PQ_K=16 x rerank 8 configuration stage by stage."""
    from ..operators.similarity import PQ_PROJ_TABLE, rp_weight

    m, k, dsub, rerank = 16, 16, 4, 8
    w = "[" + ", ".join(repr(rp_weight(PQ_PROJ_TABLE, d)) for d in range(dsub)) + "]"
    return f"""
        WITH sub AS (
            SELECT vec_id, embedding, CAST(t.s AS INTEGER) AS s,
                   embedding[CAST(t.s * {dsub} + 1 AS INTEGER):CAST((t.s + 1) * {dsub} AS INTEGER)] AS v
            FROM embeddings, (SELECT unnest(range({m})) AS s) t
            WHERE vec_id <> 0
        ),
        proj AS (SELECT vec_id, s, v, {_dot_sql('v', w)} AS p FROM sub),
        rng AS (SELECT s, min(p) AS lo, max(p) AS hi FROM proj GROUP BY s),
        cells AS (
            SELECT vec_id, proj.s, v,
                   CAST(CASE WHEN hi > lo
                             THEN LEAST({k - 1},
                                  CAST(floor((p - lo) / ((hi - lo) / {k})) AS INTEGER))
                             ELSE 0 END AS INTEGER) AS cell
            FROM proj JOIN rng ON proj.s = rng.s
        ),
        cent0 AS ({_pq_means_sql('cells')}),
        enc0 AS ({_pq_encode_sql('cent0')}),
        cent AS ({_pq_means_sql('(SELECT b.s, e.cell, b.v FROM sub b JOIN enc0 e ON b.vec_id = e.vec_id AND b.s = e.s)')}),
        enc AS ({_pq_encode_sql('cent')}),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        qsub AS (
            SELECT c.s, c.cell,
                   q.q_emb[CAST(c.s * {dsub} + 1 AS INTEGER):CAST((c.s + 1) * {dsub} AS INTEGER)] AS qv,
                   c.centroid
            FROM cent c, q
        ),
        dtab AS (SELECT s, cell, {_l2_sql('qv', 'centroid')} AS d FROM qsub),
        adist AS (
            SELECT e.vec_id,
                   list_reduce(list(t.d ORDER BY t.s), (acc, v) -> acc + v) AS ad
            FROM enc e JOIN dtab t ON e.s = t.s AND e.cell = t.cell
            GROUP BY e.vec_id
        ),
        cand AS (SELECT vec_id FROM adist ORDER BY ad ASC, vec_id ASC LIMIT {10 * rerank})
        SELECT e.vec_id, {_l2_sql('e.embedding', 'q.q_emb')} AS l2sq
        FROM embeddings e JOIN cand USING (vec_id), q
        ORDER BY l2sq ASC, e.vec_id ASC
        LIMIT 10
    """


def _idot_sql(a: str, b: str) -> str:
    """Twin of similarity.int_dot: exact int64 dot of quantized codes —
    integer addition is order-independent, so a plain left fold matches any
    summation order Spark picks."""
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i]), (acc, v) -> acc + v)"
    )


# Twin of similarity.quantize_int8: scale = 127/max|x| (0 when the vector is
# all zeros), code = floor(x*scale + 0.5) — floor, not round, because engines
# disagree on round-half for doubles.
_Q8 = (
    "list_transform({v}, x -> CAST(floor(CAST(x AS DOUBLE) * "
    "(CASE WHEN {amax} > 0 THEN 127.0 / {amax} ELSE 0.0 END) + 0.5) AS BIGINT))"
)
_AMAX = "list_max(list_transform({v}, x -> abs(CAST(x AS DOUBLE))))"


def _rp_proj_sql(vec: str, table: str) -> str:
    """Twin of similarity.rp_lsh_buckets' projection: sequential left-fold
    dot of the vector with the md5-derived weight matrix (rp_weight) —
    fold order matches Spark's aggregate HOF, so the double (and its floor
    bucket) is bit-identical."""
    w = (
        "((CAST(('0x' || substr(md5(CAST(" + table + " AS VARCHAR) || ',' || "
        "CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0)"
    )
    return (
        f"list_reduce(list_transform(range(1, len({vec}) + 1), "
        f"i -> CAST({vec}[i] AS DOUBLE) * {w}), (acc, v) -> acc + v)"
    )


# --- portable-hash dedup oracles (twin of dedup.portable_hash60 + the
# minhash/simhash pipelines with portable=True) ---------------------------

_MINHASH_P = (1 << 31) - 1


def _basehash_sql(x: str) -> str:
    """Twin of dedup.portable_hash60: integer value of md5's first 15 hex
    digits (60 bits, always non-negative)."""
    return f"CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def _minhash_pairs_ctes(
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    src: str = "documents",
) -> str:
    """The dedup.minhash_lsh_pairs replay as a reusable CTE chain ending
    in ``lsh_pairs (id_a, id_b, jaccard)`` — composable over any
    ``(doc_id, text)`` source CTE (the q_corpus_build_near composition
    splices it after its exact-dedup stage)."""
    r = num_hashes // bands
    # affine family twin: (x*(2i+1) + (1000003*i + 12345)) % p on base = h % p
    mins = ",\n               ".join(
        f"coalesce(list_min(list_transform(b, x -> (x * {2 * i + 1} + {1000003 * i + 12345})"
        f" % {_MINHASH_P})), {_MINHASH_P}) AS m{i}"
        for i in range(num_hashes)
    )
    band_rows = "\n            UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws(',', {ms}) AS sig FROM m".format(
            b=b, ms=", ".join(f"m{b * r + j}" for j in range(r))
        )
        for b in range(bands)
    )
    return f"""t AS (SELECT doc_id, {_TOKS} AS toks FROM {src}),
        s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
        hs AS (
            SELECT doc_id, list_distinct(list_transform(sh, g -> {_basehash_sql('g')})) AS hs
            FROM s WHERE len(sh) > 0
        ),
        base AS (SELECT doc_id, list_transform(hs, h -> h % {_MINHASH_P}) AS b FROM hs),
        m AS (SELECT doc_id,
               {mins}
              FROM base),
        banded AS (
            {band_rows}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        ),
        lsh_pairs AS (
            SELECT id_a, id_b, jaccard FROM (
                SELECT c.id_a, c.id_b,
                       CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
                       / CAST(len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))
                              AS DOUBLE) AS jaccard
                FROM cand c
                JOIN hs ha ON c.id_a = ha.doc_id
                JOIN hs hb ON c.id_b = hb.doc_id
            ) WHERE jaccard >= {threshold}
        )"""


def _minhash_lsh_oracle(num_hashes: int = 32, bands: int = 8, threshold: float = 0.5) -> str:
    return f"""
        WITH {_minhash_pairs_ctes(num_hashes, bands, threshold)}
        SELECT id_a, id_b, jaccard FROM lsh_pairs
    """


def _simhash_oracle(max_hamming: int = 3, bands: int = 4) -> str:
    width = 64 // bands
    mask = (1 << width) - 1
    # bits 60-63 of the 60-bit portable hash are structurally 0 -> their
    # votes are uniformly negative -> signature bits 60-63 are 0; summing
    # 60 disjoint bit terms therefore equals the Spark 64-bit OR-fold.
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (hv >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(60)
    )
    sig = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST(1 AS BIGINT) << {i} ELSE CAST(0 AS BIGINT) END)"
        for i in range(60)
    )
    chunk_rows = "\n            UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS chunk FROM sig"
        for b in range(bands)
    )
    return f"""
        WITH e AS (SELECT doc_id, unnest({_TOKS}) AS tk FROM documents),
        h AS (SELECT doc_id, {_basehash_sql('tk')} AS hv FROM e),
        v AS (SELECT doc_id,
               {votes}
              FROM h GROUP BY doc_id),
        sig AS (SELECT doc_id, {sig} AS simhash FROM v),
        banded AS (
            {chunk_rows}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.simhash AS sh_a, b.simhash AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
        FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
    """

ORACLE_SQL: dict[str, str] = {
    "q_text_tokens": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}')) AS INTEGER)
                   AS n_bpe_tokens
        FROM documents
    """,
    "q_text_quality": f"""
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_chars,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               CAST(len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and', 'is')))
                    AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE) AS stopword_ratio,
               CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) AS punct_ratio
        FROM documents
    """,
    "q_text_langid": f"SELECT doc_id, {_LANGID_CASE} AS lang_pred FROM documents",
    "q_text_commonness": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKS}) AS t FROM documents
        ),
        freq AS (SELECT t, count(*) AS tf FROM tok GROUP BY t),
        tot AS (SELECT count(*) AS c FROM tok)
        SELECT tok.doc_id,
               CAST(SUM(freq.tf) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * CAST(tot.c AS DOUBLE)) AS commonness
        FROM tok JOIN freq ON tok.t = freq.t, tot
        GROUP BY tok.doc_id, tot.c
    """,
    "q_text_repetition": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        b AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(toks), 1)),
                                         i -> toks[i] || ' ' || toks[i+1])) AS g
            FROM t
        ),
        bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY doc_id, g),
        bm AS (SELECT doc_id, max(c) AS mx, sum(c) AS nbg FROM bc GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) AS dup_token_frac,
               coalesce(CAST(bm.mx AS DOUBLE) / CAST(bm.nbg AS DOUBLE), 0.0)
                   AS top_bigram_frac
        FROM t LEFT JOIN bm ON t.doc_id = bm.doc_id
    """,
    "q_dedup_clusters": f"""
        WITH RECURSIVE t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
        e AS (SELECT doc_id AS id, len(sh) AS nsh, unnest(sh) AS g FROM s),
        i AS (
            SELECT a.id AS id_a, b.id AS id_b, a.nsh AS nsh_a, b.nsh AS nsh_b,
                   count(*) AS c
            FROM e a JOIN e b ON a.g = b.g AND a.id < b.id
            GROUP BY 1, 2, 3, 4
        ),
        pairs AS (
            SELECT id_a, id_b FROM (
                SELECT id_a, id_b,
                       CAST(c AS DOUBLE) / CAST(nsh_a + nsh_b - c AS DOUBLE) AS jaccard
                FROM i
            ) WHERE jaccard >= {JACCARD_THRESHOLD}
        ),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        reach(id, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e2.src, r.lbl FROM edges e2 JOIN reach r ON e2.dst = r.id
        )
        SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
    """,
    "q_decontaminate": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
        bench AS (
            SELECT DISTINCT {_basehash_sql('g')} AS h
            FROM (SELECT unnest(sh) AS g FROM s WHERE doc_id % 20 = 0)
        ),
        corp AS (
            SELECT doc_id, {_basehash_sql('g')} AS h
            FROM (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 20 <> 0)
        ),
        contaminated AS (
            SELECT DISTINCT c.doc_id FROM corp c JOIN bench b ON c.h = b.h
        )
        SELECT d.doc_id, d.lang, d.source FROM documents d
        WHERE d.doc_id % 20 <> 0
          AND NOT EXISTS (SELECT 1 FROM contaminated x WHERE x.doc_id = d.doc_id)
    """,
    "q_doc_fingerprint": f"SELECT doc_id, md5({_NORMALIZED}) AS fingerprint FROM documents",
    "q_dedup_exact": f"""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY md5({_NORMALIZED})
    """,
    "q_dedup_ngram_jaccard": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
        e AS (SELECT doc_id AS id, len(sh) AS nsh, unnest(sh) AS g FROM s),
        i AS (
            SELECT a.id AS id_a, b.id AS id_b, a.nsh AS nsh_a, b.nsh AS nsh_b,
                   count(*) AS c
            FROM e a JOIN e b ON a.g = b.g AND a.id < b.id
            GROUP BY 1, 2, 3, 4
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT id_a, id_b,
                   CAST(c AS DOUBLE) / CAST(nsh_a + nsh_b - c AS DOUBLE) AS jaccard
            FROM i
        ) WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    "q_dedup_minhash_lsh": _minhash_lsh_oracle(
        num_hashes=32, bands=8, threshold=JACCARD_THRESHOLD
    ),
    "q_dedup_simhash": _simhash_oracle(max_hamming=3, bands=4),
    "q_dedup_embedding": f"""
        SELECT id_a, id_b, cosine FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   {_cosine_sql('a.embedding', 'b.embedding')} AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
        ) WHERE cosine >= {COSINE_PAIR_THRESHOLD}
    """,
    "q_dedup_semantic": f"""
        WITH px AS (
            SELECT label, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ),
        means AS (
            SELECT label, pos,
                   CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,7))) AS VARCHAR)
                        AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
            FROM px GROUP BY label, pos
        ),
        cent AS (
            SELECT CAST(label AS INTEGER) AS cell, list(m ORDER BY pos) AS centroid
            FROM means GROUP BY label
        ),
        scores AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   {_cosine_sql('e.embedding', 'c.centroid')} AS cs
            FROM embeddings e, cent c
        ),
        assigned AS (
            SELECT vec_id, embedding, cell FROM (
                SELECT vec_id, embedding, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cell ASC) AS rn
                FROM scores
            ) WHERE rn = 1
        ),
        drops AS (
            SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE {_cosine_sql('a.embedding', 'b.embedding')}
                  >= {SEMANTIC_DEDUP_THRESHOLD}
        )
        SELECT a.vec_id, a.cell FROM assigned a
        WHERE NOT EXISTS (SELECT 1 FROM drops d WHERE d.vec_id = a.vec_id)
    """,
    "q_dedup_incremental": f"""
        WITH fp AS (SELECT doc_id, md5({_NORMALIZED}) AS f FROM documents),
        idx AS (SELECT DISTINCT f FROM fp WHERE doc_id % 3 = 0),
        fresh AS (
            SELECT doc_id, f FROM fp b
            WHERE doc_id % 3 <> 0
              AND NOT EXISTS (SELECT 1 FROM idx i WHERE i.f = b.f)
        ),
        keep AS (SELECT min(doc_id) AS doc_id FROM fresh GROUP BY f)
        SELECT d.doc_id, d.lang, d.source
        FROM documents d JOIN keep USING (doc_id)
    """,
    "q_embedding_cosine_topk": f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, {_cosine_sql('e.embedding', 'q.q_emb')} AS cosine
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT 10
    """,
    # exact euclidean top-10 witness (left-fold of squared diffs, the same
    # sequential accumulation as the Spark kernel) + pinned recall boolean
    "q_ann_lsh": f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, {_euclid_sql('e.embedding', 'q.q_emb')} AS distance,
               TRUE AS recall_ok
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY distance ASC, e.vec_id ASC
        LIMIT 10
    """,
    "q_maxsim_topk": f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        ts AS (SELECT unnest(range(1, 5)) AS t),
        dt AS (
            SELECT e.vec_id, e.embedding[(ts.t - 1) * 16 + 1 : ts.t * 16] AS dv
            FROM embeddings e, ts
            WHERE e.vec_id <> 0
        ),
        qt AS (
            SELECT ts.t AS qtok, q.q_emb[(ts.t - 1) * 16 + 1 : ts.t * 16] AS qv
            FROM q, ts
        ),
        mx AS (
            SELECT d.vec_id, qt.qtok,
                   MAX({_cosine_sql('d.dv', 'qt.qv')}) AS m
            FROM dt d, qt
            GROUP BY d.vec_id, qt.qtok
        ),
        tot AS (
            SELECT vec_id,
                   list_reduce(list(m ORDER BY qtok), (acc, v) -> acc + v) AS maxsim
            FROM mx GROUP BY vec_id
        )
        SELECT vec_id, maxsim FROM tot
        ORDER BY maxsim DESC, vec_id ASC
        LIMIT 10
    """,
    "q_ann_ivf_topk": f"""
        WITH px AS (
            SELECT label, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ),
        means AS (
            SELECT label, pos,
                   CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,7))) AS VARCHAR)
                        AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
            FROM px GROUP BY label, pos
        ),
        cent AS (
            SELECT CAST(label AS INTEGER) AS cell, list(m ORDER BY pos) AS centroid
            FROM means GROUP BY label
        ),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        scores AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   {_cosine_sql('e.embedding', 'c.centroid')} AS cs
            FROM embeddings e, cent c WHERE e.vec_id <> 0
        ),
        assigned AS (
            SELECT vec_id, embedding, cell FROM (
                SELECT vec_id, embedding, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cell ASC) AS rn
                FROM scores
            ) WHERE rn = 1
        ),
        probe AS (
            SELECT cell FROM (
                SELECT c.cell, {_cosine_sql('c.centroid', 'q.q_emb')} AS qs
                FROM cent c, q
            ) ORDER BY qs DESC, cell ASC LIMIT 3
        )
        SELECT a.vec_id, {_cosine_sql('a.embedding', 'q.q_emb')} AS cosine
        FROM assigned a, q
        WHERE a.cell IN (SELECT cell FROM probe)
        ORDER BY cosine DESC, a.vec_id ASC
        LIMIT 10
    """,
    "q_ann_rp_lsh": f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        tables AS (SELECT range AS t FROM range(0, 8)),
        data_b AS (
            SELECT e.vec_id, e.embedding, tables.t AS tbl,
                   floor({_rp_proj_sql('e.embedding', 'tables.t')} / 0.25) AS bucket
            FROM embeddings e, tables WHERE e.vec_id <> 0
        ),
        q_b AS (
            SELECT tables.t AS tbl,
                   floor({_rp_proj_sql('q.q_emb', 'tables.t')} / 0.25) + off.o AS bucket
            FROM q, tables, (VALUES (-1), (0), (1)) off(o)
        ),
        cand AS (
            SELECT DISTINCT d.vec_id, d.embedding
            FROM data_b d JOIN q_b ON d.tbl = q_b.tbl AND d.bucket = q_b.bucket
        )
        SELECT c.vec_id, {_cosine_sql('c.embedding', 'q.q_emb')} AS cosine
        FROM cand c, q
        ORDER BY cosine DESC, c.vec_id ASC
        LIMIT 10
    """,
    "q_ann_quantized": f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        d0 AS (
            SELECT vec_id, embedding, {_AMAX.format(v='embedding')} AS amax
            FROM embeddings WHERE vec_id <> 0
        ),
        dq AS (
            SELECT vec_id, embedding,
                   {_Q8.format(v='embedding', amax='amax')} AS qv
            FROM d0
        ),
        q0 AS (SELECT q_emb, {_AMAX.format(v='q_emb')} AS amax FROM q),
        qq AS (
            SELECT q_emb, {_Q8.format(v='q_emb', amax='amax')} AS qqv FROM q0
        ),
        cand AS (
            SELECT vec_id, embedding FROM (
                SELECT d.vec_id, d.embedding,
                       CAST({_idot_sql('d.qv', 'qq.qqv')} AS DOUBLE)
                       / (sqrt(CAST({_idot_sql('d.qv', 'd.qv')} AS DOUBLE))
                          * sqrt(CAST({_idot_sql('qq.qqv', 'qq.qqv')} AS DOUBLE)))
                           AS acs
                FROM dq d, qq
            ) ORDER BY acs DESC, vec_id ASC LIMIT 40
        )
        SELECT c.vec_id, {_cosine_sql('c.embedding', 'q.q_emb')} AS cosine
        FROM cand c, q
        ORDER BY cosine DESC, c.vec_id ASC
        LIMIT 10
    """,
    "q_ann_pq_topk": _pq_oracle_sql(),
    "q_ann_ivf_refined": f"""
        WITH px AS (
            SELECT label, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ),
        means AS (
            SELECT label, pos,
                   CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,7))) AS VARCHAR)
                        AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
            FROM px GROUP BY label, pos
        ),
        cent AS (
            SELECT CAST(label AS INTEGER) AS cell, list(m ORDER BY pos) AS centroid
            FROM means GROUP BY label
        ),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        scores AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   {_cosine_sql('e.embedding', 'c.centroid')} AS cs
            FROM embeddings e, cent c WHERE e.vec_id <> 0
        ),
        assigned AS (
            SELECT vec_id, embedding, cell FROM (
                SELECT vec_id, embedding, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cell ASC) AS rn
                FROM scores
            ) WHERE rn = 1
        ),
        px2 AS (
            SELECT cell, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM assigned
        ),
        means2 AS (
            SELECT cell, pos,
                   CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,7))) AS VARCHAR)
                        AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
            FROM px2 GROUP BY cell, pos
        ),
        cent2 AS (
            SELECT CAST(cell AS INTEGER) AS cell, list(m ORDER BY pos) AS centroid
            FROM means2 GROUP BY cell
        ),
        scores2 AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   {_cosine_sql('e.embedding', 'c.centroid')} AS cs
            FROM embeddings e, cent2 c WHERE e.vec_id <> 0
        ),
        assigned2 AS (
            SELECT vec_id, embedding, cell FROM (
                SELECT vec_id, embedding, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cell ASC) AS rn
                FROM scores2
            ) WHERE rn = 1
        ),
        probe2 AS (
            SELECT cell FROM (
                SELECT c.cell, {_cosine_sql('c.centroid', 'q.q_emb')} AS qs
                FROM cent2 c, q
            ) ORDER BY qs DESC, cell ASC LIMIT 3
        )
        SELECT a.vec_id, {_cosine_sql('a.embedding', 'q.q_emb')} AS cosine
        FROM assigned2 a, q
        WHERE a.cell IN (SELECT cell FROM probe2)
        ORDER BY cosine DESC, a.vec_id ASC
        LIMIT 10
    """,
    "q_training_data_pipeline": f"""
        WITH quality AS (
            SELECT doc_id, text,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                       / CAST(length(text) AS DOUBLE) AS punct_ratio,
                   {_LANGID_CASE} AS lang_pred
            FROM documents
        ),
        filtered AS (
            SELECT * FROM quality
            WHERE n_tokens >= 5 AND punct_ratio < 0.25 AND lang_pred = 'en'
        ),
        survivors AS (
            SELECT doc_id, n_tokens, lang_pred FROM (
                SELECT doc_id, n_tokens, lang_pred,
                       row_number() OVER (PARTITION BY md5({_NORMALIZED})
                                          ORDER BY doc_id ASC) AS rn
                FROM filtered
            ) WHERE rn = 1
        )
        SELECT doc_id, n_tokens, lang_pred FROM survivors
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 100 < 50
    """,
    "q_pack_sequences": f"""
        WITH t AS (
            SELECT doc_id, CAST(len({_TOKS}) AS INTEGER) AS n_tokens FROM documents
        ),
        c AS (
            SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS start
            FROM t
        )
        SELECT doc_id, n_tokens,
               CAST(floor(start / 512) AS BIGINT) AS seq_id,
               CAST(start % 512 AS BIGINT) AS seq_offset
        FROM c
    """,
    "q_window_tumbling": (
        "SELECT date_trunc('day', ts) AS day, count(*) AS n_events, "
        "CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 2) AS VARCHAR) AS DOUBLE) "
        "AS total_value FROM events GROUP BY date_trunc('day', ts)"
    ),
    "q_sessionize": """
        WITH ev AS (
            SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
        ),
        flagged AS (
            SELECT user_id, event_id, ms,
                   CASE WHEN ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
        ),
        sessions AS (
            SELECT user_id, ms,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ms, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS INTEGER) AS session_idx
            FROM flagged
        )
        SELECT user_id, session_idx, count(*) AS n_events,
               CAST(max(ms) - min(ms) AS DOUBLE) / 1000.0 AS duration_s
        FROM sessions GROUP BY user_id, session_idx
    """,
    # session_window semantics: the window end is EXCLUSIVE, so a gap equal
    # to the 30-minute timeout opens a new session (>=, not >), and the
    # comparison happens at the store's full microsecond precision.
    "q_session_window": """
        WITH ev AS (
            SELECT user_id, event_id, epoch_us(ts) AS us
            FROM events WHERE ts IS NOT NULL
        ),
        flagged AS (
            SELECT user_id, event_id, us,
                   CASE WHEN us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END
                       AS new_session
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        sessions AS (
            SELECT user_id, us,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS si
            FROM flagged
        )
        SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
               CAST(max(us) - min(us) AS DOUBLE) / 1000000.0 AS duration_s
        FROM sessions GROUP BY user_id, si
    """,
}
