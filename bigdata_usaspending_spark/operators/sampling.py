"""Deterministic sampling for reproducible training-data pipelines.

``df.sample()`` is seeded but engine-private: no other system can reproduce
which rows it kept, so a sampled training set can't be audited or rebuilt
elsewhere. Hash-gate sampling fixes that: a row is kept iff
``hash(key) % denominator < numerator``. Properties a 100-TB pipeline needs:

- reproducible anywhere (the gate is pure arithmetic over a portable hash —
  dedup.portable_hash60, replayable in any SQL engine);
- stable under reruns, repartitioning, and insertion order;
- consistent across tables: sampling two tables by the same key keeps the
  SAME entities in both (joinable samples — ``sample()`` cannot do this);
- a pure map: no shuffle, full codegen, trivially pushed before wide ops.

Rates are expressed as integer numerator/denominator so the gate is exact
(no float rate drift).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash60


def hash_gate(key: Column | str, numerator: int, denominator: int = 100) -> Column:
    """Boolean keep-gate: stable pseudo-uniform bucket of the key falls
    below the rate."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(portable_hash60(c.cast("string")), F.lit(denominator)) < numerator


def hash_sample(
    df: DataFrame, key: str, numerator: int, denominator: int = 100
) -> DataFrame:
    """Keep ~numerator/denominator of rows, deterministically by key."""
    return df.filter(hash_gate(key, numerator, denominator))


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    rates: dict[str, tuple[int, int]],
    default: tuple[int, int] = (0, 1),
) -> DataFrame:
    """Per-stratum rates (the quality-tier downsampling every training-data
    mix uses: keep 100% of high quality, x% of the rest). ``rates`` maps
    stratum value -> (numerator, denominator); unlisted strata use
    ``default`` (drop, by default)."""
    gate = None
    for value, (num, den) in rates.items():
        cond = (F.col(stratum_col) == value) & hash_gate(key, num, den)
        gate = cond if gate is None else gate | cond
    other = ~F.col(stratum_col).isin(*rates.keys()) & hash_gate(key, *default)
    gate = other if gate is None else gate | other
    return df.filter(gate)


def token_budget_head(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-stratum token-budget head selection: walk each stratum (source,
    language, quality tier) in deterministic ascending ``id_col`` order and
    keep documents that START before the stratum's cumulative token count
    reaches ``budget`` — how a training mix pins "N tokens of source X"
    exactly, reproducibly, instead of approximating via sampling rates.

    The kept set is defined by the PRE-document running total
    (``tokens_before < budget``), so each stratum keeps at least one
    document and the boundary document straddles the budget rather than
    being dropped — matching sequence-packing downstream, which can cut it.

    Scale shape: the naive ``SUM OVER (PARTITION BY stratum ORDER BY id)``
    serializes each stratum through one task — fatal when a stratum is most
    of a 100-TB corpus. This uses the pack_sequences two-pass prefix sum
    with the stratum prepended to the keys: monotone id-range buckets make
    (stratum, bucket)-local cumsums compose, the per-bucket offsets table
    (|strata| x num_partitions rows, map-side partially aggregated) is
    broadcast back, and the only corpus-sized shuffle is the bucket-local
    window's. Emits ``tokens_before`` for auditability."""
    from pyspark.sql import Window

    n_buckets = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    lo, hi = df.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        lo, hi = 0, 0
    span = float(hi - lo + 1)
    part = df.withColumn(
        "_pid",
        F.floor(
            (F.col(id_col) - F.lit(lo)).cast("double") * n_buckets / F.lit(span)
        ).cast("int"),
    )
    w_local = (
        Window.partitionBy(stratum_col, "_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_lcum", F.sum(tokens_col).over(w_local))
    w_pid = (
        Window.partitionBy(stratum_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        part.groupBy(stratum_col, "_pid")
        .agg(F.sum(tokens_col).alias("_ptot"))
        .withColumn("_poff", F.coalesce(F.sum("_ptot").over(w_pid), F.lit(0)))
        .select(stratum_col, "_pid", "_poff")
    )
    before = (F.col("_lcum") - F.col(tokens_col) + F.col("_poff")).cast("long")
    return (
        local.join(F.broadcast(offsets), on=[stratum_col, "_pid"])
        .withColumn("tokens_before", before)
        .filter(F.col("tokens_before") < budget)
        .drop("_pid", "_lcum", "_poff")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the pretraining step that lays
    documents end to end in a deterministic order (ascending ``id_col``) and
    cuts the token stream into fixed ``budget``-token training sequences.
    Every document gets (seq_id, seq_offset) = where its first token lands;
    documents straddle sequence boundaries freely, exactly like the
    tokenizer-side packing used for GPT-style training.

    The naive formulation — ``SUM(n_tokens) OVER (ORDER BY id)`` — is a
    single-partition window: the full corpus funnels through one task, the
    same scale-killer the exact-median once had. This implementation is the
    scalable two-pass prefix sum:

    1. assign each row a MONOTONE bucket ``_pid = floor((id-lo)*P/span)``
       from a one-pass min/max of the id (monotone: bucket order == id
       order, so bucket-local prefix sums compose globally). Cumsum within
       each bucket — a parallel window, hash-shuffled on ``_pid``;
    2. aggregate one row per bucket (its token total — map-side partial
       aggregation means only ~P rows per map task cross the wire, never
       the corpus), prefix-sum those P rows (a window over num_partitions
       rows, trivially small), and broadcast the per-bucket starting
       offsets back.

    Global position = bucket-local cumsum + bucket offset — identical to
    the single-partition answer for ANY bucket boundaries (integer addition
    is associative). Cost: one cheap min/max scan + ONE corpus shuffle.
    (An earlier spark_partition_id()-based variant paid a second full
    shuffle: Catalyst cannot know physical partition ids are co-located,
    so the window re-exchanged on _pid anyway.) Bucket balance follows id
    density; wildly skewed id spaces should pre-densify (zipWithIndex-style)
    or raise num_partitions. seq_id/seq_offset stay exact below 2^53 total
    tokens (~9e15 — two orders above a 100-TB corpus).
    """
    from pyspark.sql import Window

    n_buckets = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    lo, hi = df.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        lo, hi = 0, 0
    span = float(hi - lo + 1)
    part = df.select(F.col(id_col), F.col(tokens_col)).withColumn(
        "_pid",
        F.floor(
            (F.col(id_col) - F.lit(lo)).cast("double") * n_buckets / F.lit(span)
        ).cast("int"),
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_lcum", F.sum(tokens_col).over(w_local))
    # one row per bucket; the prefix window runs over num_partitions rows
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_pid")
        .agg(F.sum(tokens_col).alias("_ptot"))
        .withColumn("_poff", F.coalesce(F.sum("_ptot").over(w_pid), F.lit(0)))
        .select("_pid", "_poff")
    )
    start = (F.col("_lcum") - F.col(tokens_col) + F.col("_poff")).cast("long")
    return (
        local.join(F.broadcast(offsets), on="_pid")
        .select(
            F.col(id_col),
            F.col(tokens_col),
            F.floor(start / budget).cast("long").alias("seq_id"),
            F.pmod(start, F.lit(budget)).cast("long").alias("seq_offset"),
        )
    )


def global_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training order: every row gets
    ``position`` = its rank under a seeded pseudo-random permutation. The
    epoch-shuffle step of a pretraining pipeline — ``df.orderBy(rand())``
    is irreproducible and a bare sort gives no addressable position.

    The permutation key is ``portable_hash60(seed || key)`` — replayable in
    any engine (same portability argument as hash_gate) and re-seedable per
    epoch. Rank is computed WITHOUT a single-partition window: buckets are
    equal-width ranges of the 60-bit hash space (hash is uniform, so
    buckets balance regardless of key skew; int64→double bucketing is
    monotone, so bucket order composes with hash order), bucket-local
    row_number windows run in parallel, and the per-bucket counts —
    num_partitions rows after map-side partial aggregation — prefix-sum on
    the driver-side-tiny window and broadcast back (the pack_sequences
    two-pass shape on the hash axis). One corpus-sized shuffle total.
    Ties on the 60-bit hash break by key, so position is a permutation of
    [0, N) for ANY key collision pattern."""
    from pyspark.sql import Window

    n_buckets = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    h = portable_hash60(
        F.concat(F.lit(str(seed)), F.lit(":"), F.col(key_col).cast("string"))
    )
    part = df.withColumn("_h", h).withColumn(
        "_pid",
        F.floor(F.col("_h").cast("double") * n_buckets / F.lit(float(1 << 60)))
        .cast("int"),
    )
    w_local = Window.partitionBy("_pid").orderBy("_h", key_col)
    local = part.withColumn("_lrn", F.row_number().over(w_local))
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_pn"))
        .withColumn("_poff", F.coalesce(F.sum("_pn").over(w_pid), F.lit(0)))
        .select("_pid", "_poff")
    )
    return (
        local.join(F.broadcast(offsets), on="_pid")
        .withColumn("position", (F.col("_lrn") - 1 + F.col("_poff")).cast("long"))
        .drop("_h", "_pid", "_lrn", "_poff")
    )


def temperature_mix(
    df: DataFrame,
    key: str,
    stratum_col: str,
    target_total: int,
    alpha: float = 0.5,
    denominator: int = 1_000_000,
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual/multi-source
    rebalancing rule from the mT5/XLM-R line of work, arXiv:1910.10683
    §3.1): source s is sampled with probability proportional to n_s^alpha,
    so alpha=1 preserves the natural distribution and alpha->0 approaches
    uniform over sources — small sources are boosted, dominant ones
    tempered.

    Per-source keep rates derive IN-ENGINE from the source counts
    (expected_s = target_total * w_s / W, rate_s = min(1, expected_s/n_s)),
    then gate rows with the deterministic portable hash — two linear
    passes, the rate table is tiny and broadcast. Reproducibility: with
    alpha=0.5 the weight is sqrt(n) (correctly-rounded IEEE, identical in
    any engine); other alphas go through pow(), which is NOT guaranteed
    correctly rounded across libm implementations — fine in production,
    not bit-portable for an external oracle. The weight SUM accumulates in
    decimal (order-independent) before one double division chain written
    left-to-right, and the rate is quantized to an integer threshold in
    ``denominator``-ths so the gate compares integers."""
    n = F.count(F.lit(1)).cast("double")
    counts = df.groupBy(stratum_col).agg(n.alias("_n"))
    wt = F.sqrt(F.col("_n")) if alpha == 0.5 else F.pow(F.col("_n"), F.lit(alpha))
    weights = counts.select(stratum_col, "_n", wt.alias("_wt"))
    total = weights.agg(
        F.sum(F.col("_wt").cast("decimal(27,7)")).cast("double").alias("_W")
    )
    rate = F.least(
        F.lit(1.0), F.lit(float(target_total)) * F.col("_wt") / F.col("_W") / F.col("_n")
    )
    thresholds = (
        weights.crossJoin(F.broadcast(total))
        .select(
            stratum_col,
            F.floor(rate * F.lit(float(denominator))).cast("bigint").alias("_thr"),
        )
    )
    gated = df.join(F.broadcast(thresholds), stratum_col).filter(
        F.pmod(portable_hash60(F.col(key).cast("string")), F.lit(denominator))
        < F.col("_thr")
    )
    return gated.select(*df.columns)


def _portable_salt_hash(salt_cols: "Sequence[str]", seed: int):
    """The portable-path rank-hash input: concat_ws('|') over the cast salt
    columns + seed, md5-folded to 60 bits. CONTRACT on the portable path:
    salt columns must be NON-NULL and their string forms '|'-free —
    concat_ws skips nulls and '|' is the joiner, so a null salt or an
    embedded '|' can make two distinct rows share a hash input (and hence
    a rank key), skewing the draw for those keys. The corpus salts are
    integer primary keys, which satisfy this trivially; for free-text
    salts either escape the components or use the xxhash64 path
    (portable=False), which hashes typed values and has no such seam."""
    return portable_hash60(
        F.concat_ws("|", *[F.col(c).cast("string") for c in salt_cols],
                    F.lit(str(seed)))
    )


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    salt_cols: "Sequence[str]",
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Deterministic k-row sample PER GROUP: rank rows inside each group by
    a seeded hash of their identifying columns and keep the first ``k``.

    ``rand()`` re-rolls per execution (retried tasks under AQE can emit a
    DIFFERENT sample — the reproducibility bug hash_gate exists to avoid);
    hashing row identity instead makes the sample a pure function of the
    data and the seed: re-runs, retries, and engine changes all agree, and
    the oracle can replay it. One window shuffle on the group key; the
    hash order is uniform, so this is a uniform without-replacement sample
    of each group (ties broken by the salt columns for total order).
    ``portable=True`` swaps xxhash64 for the md5-derived 60-bit bridge so
    the sample replays bit-for-bit in any engine with md5 (the oracle
    corpus uses it; production keeps the cheaper xxhash64). Portable-path
    salt constraints: see _portable_salt_hash."""
    from pyspark.sql import Window

    h = F.xxhash64(*[F.col(c) for c in salt_cols], F.lit(seed))
    if portable:
        h = _portable_salt_hash(salt_cols, seed)
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in salt_cols]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    salt_cols: "Sequence[str]",
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES), derandomized: each row's exponential rank key is
    ln(u) / weight with u derived from a seeded hash of the row's identity
    instead of rand(), and the sample is the global top-k by that key.

    P(row i first) = w_i / sum(w) exactly as in A-ES; hashing row identity
    keeps the three sampling invariants of this module (rerun/retry
    stable, cross-engine replayable, auditable). Rows with non-positive or
    null weight are excluded (they have zero selection probability).

    Scale shape: the key is a pure per-row map (no shuffle), and the
    top-k compiles to TakeOrderedAndProject — per-partition partial top-k
    then a k-row merge on the driver side of ONE exchange, never a global
    sort. This is the weighted counterpart of sample_k_per_group and the
    building block for fixed-size training mixes where doc quality or
    source priors act as weights.

    ``portable=True`` uses the md5 60-bit bridge (oracle corpus);
    production uses xxhash64. The only cross-engine risk is two rank keys
    within 1 ulp after ln/division — probability ~2^-50 per pair, and the
    salt-column tiebreak bounds the damage to adjacent-rank swaps.
    Portable-path salt constraints (non-null, '|'-free): see
    _portable_salt_hash.
    """
    h = F.xxhash64(*[F.col(c) for c in salt_cols], F.lit(seed))
    if portable:
        h = _portable_salt_hash(salt_cols, seed)
    # u in (0,1]: fold the (possibly signed full-width xxhash64) value into
    # [0, 2^60) first — pmod is a no-op for the already-60-bit portable
    # hash — then scale by 2^60 (IEEE nearest-rounding is engine-identical),
    # +1 so u is never exactly 0 (ln(0) = -inf)
    u = (F.pmod(h, F.lit(1 << 60)).cast("double") + F.lit(1.0)) / F.lit(
        float(1 << 60)
    )
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    # NaN needs an explicit guard: Spark orders NaN above every double, so
    # NaN > 0 is TRUE and a NaN weight would both survive the filter and
    # (as a NaN rank key) sort to the TOP of the sample
    return (
        df.filter((w > 0) & ~F.isnan(w))
        .withColumn("_wkey", key)
        .orderBy(F.desc("_wkey"), *[F.col(c).asc() for c in salt_cols])
        .limit(k)
        .drop("_wkey")
    )


def largest_remainder_quotas(
    weights: DataFrame,
    key_col: str,
    weight_col: str,
    total: int,
) -> DataFrame:
    """Integer quota per key summing EXACTLY to ``total`` — Hamilton's
    largest-remainder apportionment: every key gets floor(share), then the
    leftover seats go to the largest fractional remainders (ties broken by
    key ASC, so the allocation is deterministic and engine-replayable).

    This is the missing piece between "mix sources 30/50/20" and an
    exact-size training mix: naive per-source rounding drifts the total
    by up to n_keys/2 rows; temperature_mix gates by rate (approximate
    size); this produces integer quotas that sum exactly. Share
    arithmetic is double (w / total_w * total) with identical expression
    shape on the oracle side; all counts integer.

    Scale shape: the weights frame is key-cardinality-sized (an
    aggregate of the corpus, not the corpus); one window over it is a
    dim-table sort."""
    from pyspark.sql import Window

    # exact-decimal total weight (float sums are partition-order-dependent
    # — the exact_sum lesson), cast to double once for the share division
    tw = weights.agg(
        F.sum(F.col(weight_col).cast("decimal(27,7)"))
        .cast("double")
        .alias("_tw")
    )
    share = (
        F.col(weight_col).cast("double") / F.col("_tw") * F.lit(float(total))
    )
    shared = weights.crossJoin(F.broadcast(tw)).select(
        F.col(key_col),
        F.floor(share).cast("bigint").alias("_floor"),
        (share - F.floor(share)).alias("_rem"),
    )
    deficit = shared.agg(
        (F.lit(int(total)) - F.sum("_floor")).alias("_deficit")
    )
    # global rank over a key-cardinality-sized frame: the one place a
    # single-partition window is correct by construction (dim-sized input)
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("_rem"), F.asc(key_col))
    )
    return (
        shared.crossJoin(F.broadcast(deficit))
        .select(
            key_col,
            (F.col("_floor") + (rank <= F.col("_deficit")).cast("bigint")).alias(
                "quota"
            ),
        )
    )


def sample_quota_per_group(
    df: DataFrame,
    group_col: str,
    quotas: DataFrame,
    salt_cols: "Sequence[str]",
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """sample_k_per_group with a PER-GROUP k: keep each group's first
    ``quota`` rows under the seeded deterministic hash order. ``quotas``
    is (group, quota) — key-cardinality-sized, so it broadcasts onto the
    windowed ranking. With largest_remainder_quotas upstream this draws
    an EXACTLY-total-sized mixture with per-source composition matching
    the weights. Same determinism contract as sample_k_per_group
    (rand()-free, retry/replan stable, oracle-replayable)."""
    from pyspark.sql import Window

    h = F.xxhash64(*[F.col(c) for c in salt_cols], F.lit(seed))
    if portable:
        h = _portable_salt_hash(salt_cols, seed)
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in salt_cols]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(quotas), on=group_col)
        .filter(F.col("_rk") <= F.col("quota"))
        .drop("_rk", "quota")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    fractions: "Sequence[tuple[str, int]]",
    group_col: str | None = None,
    denominator: int = 100,
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test split assignment: adds a ``split``
    column from named integer fractions (e.g. [("train", 80), ("val",
    10), ("test", 10)]) that partition the hash space — every row gets
    exactly one label, splits are disjoint and exhaustive by
    construction, and the assignment is a pure map (no shuffle) that any
    engine replays (the hash_gate contract; randomSplit is engine-private
    and resample-unstable).

    ``group_col`` makes the split LEAKAGE-FREE at the group level: all
    rows sharing the group key (a source domain, an author, a near-dup
    cluster's canonical id) land in the SAME split, so near-identical
    documents cannot straddle train and test — the contamination that
    inflates eval scores. Without it, rows split independently by
    ``key_col``.

    Fractions must sum to ``denominator``; labels assign by cumulative
    ranges in the given order, so the mapping is stable under appending
    new splits at the end.

    The hash basis (``group_col`` if given, else ``key_col``) carries the
    same NON-NULL contract as ``_portable_salt_hash``: a null basis has no
    portable hash (SQL ``NULL || seed`` is NULL while concat_ws would
    silently skip it, colliding every null-group row into one bucket that
    also collides with empty-string keys). Rather than diverge silently,
    the gate raises at execution time on the first null basis row —
    coalesce to a sentinel or filter nulls upstream, explicitly, on BOTH
    engines."""
    fracs = list(fractions)
    tot = sum(n for _, n in fracs)
    if tot != denominator:
        raise ValueError(
            f"fractions sum to {tot}, expected denominator={denominator}"
        )
    basis_col = group_col if group_col is not None else key_col
    basis = F.col(basis_col)
    # assert_true is NULL when the condition holds (and raises per-row when
    # it doesn't), so coalescing it in front of the real basis enforces the
    # non-null contract lazily without leaving the pure-map plan shape.
    nn_guard = F.assert_true(
        basis.isNotNull(),
        F.lit(
            f"split_assign: null {basis_col!r} hash basis — the split hash "
            "needs a non-null key; coalesce to a sentinel or filter nulls "
            "upstream (on the oracle side too)"
        ),
    )
    bucket = F.pmod(
        portable_hash60(
            F.concat_ws("|", F.coalesce(nn_guard, basis.cast("string")), F.lit(str(seed)))
        ),
        F.lit(denominator),
    )
    expr = None
    hi = 0
    for name, n in fracs:
        hi += n
        cond = bucket < hi
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)
