"""Fuzzy string matching / entity resolution.

The reference matches recipient and agency records only by exact string
equality (e.g. the groupBy keys in app/spark_cassandra_etl_award_amount_aggregator.py
and the dict lookups in app/fetch_recipient_name_geo_data.py:99-105), so any
typo'd or OCR-damaged name silently becomes a distinct entity.  This module
adds the similarity-join the reference lacks: all record pairs within a small
edit distance, without the quadratic all-pairs comparison.

Algorithm (FastSS deletion neighborhoods, Bocek et al. 2007):
for ``levenshtein(a, b) <= 1`` it is necessary that the deletion
neighborhoods of ``a`` and ``b`` intersect — i.e. ``a == b``, or ``a`` equals
``b`` with one character deleted (or vice versa), or deleting one character
from EACH yields the same string.  So each row emits its string plus every
single-character-deletion variant (``len+1`` keys), candidates are the pairs
sharing a variant (an equality join Catalyst shuffles on the variant string),
and a final banded ``levenshtein(a, b, threshold)`` pass removes the
false positives the del-del case admits (it can reach distance 2).

Scale shape: the variant explode is linear — ``O(len+1)`` rows per input row
— and candidate blocks are as small as the variant-key entropy allows: unlike
prefix blocking, a shared constant prefix (every customer name starts with
``Customer#``) creates NO quadratic block, because a full deletion variant
still carries the discriminating tail.  Worst-case skew is a run of IDENTICAL
strings (their shared full-string key forms a clique); that clique is exactly
the exact-duplicate set a dedup pass upstream removes.  The method targets
short entity strings (names, codes, titles ~10-100 chars); for long texts use
the MinHash/SimHash family in operators/dedup.py.  k=2 uses the order-2
neighborhood (every <=2-deletion variant, ~len^2/2 keys per row, length
capped); for k>=3 use the segment-based PassJoin generalization of the same
blocking idea.

Everything stays in whole-stage codegen: variants are built with
``explode(sequence(...))`` + ``substring`` arithmetic (no interpreted
higher-order functions — the round-4 lesson), and verification uses the
threshold form of ``levenshtein`` which abandons a pair once the running
distance exceeds the band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _ensure_parallelism


def deletion_variants(
    df: DataFrame, id_col: str, str_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Explode each row into its FastSS order-1 deletion neighborhood.

    Emits one row per (original string + each single-deletion variant):
    ``i = 0`` keeps the string intact, ``i = 1..len`` deletes the i-th
    character.  NULL strings produce no variants (no match semantics).
    """
    s = F.col(str_col)
    base = df.where(s.isNotNull()).select(
        F.col(id_col), s.alias("_s"), *[F.col(c) for c in keep_cols]
    )
    exploded = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.length("_s"))).alias("_i")
    )
    variant = F.when(F.col("_i") == 0, F.col("_s")).otherwise(
        F.concat(
            F.expr("substring(_s, 1, _i - 1)"),
            F.expr("substring(_s, _i + 1, length(_s) - _i)"),
        )
    )
    return exploded.select(
        F.col(id_col), F.col("_s"), *keep_cols, variant.alias("_variant")
    )


# Order-2 neighborhoods are O(len^2) variants per row; past this length the
# blow-up dwarfs the quadratic block it avoids — use PassJoin segments there.
MAX_LEN_ORDER2 = 64


def deletion_variants_order2(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """Explode each row into its FastSS order-2 deletion neighborhood: the
    string itself, every single deletion, and every deletion of two distinct
    positions — ``1 + len + C(len,2)`` variants per row.

    Completeness argument (why sharing a <=2-deletion variant is a complete
    candidate set for ``levenshtein <= 2``): fix an optimal alignment; drop
    from each string its characters involved in a substitution, plus the
    deleted (left side) / inserted (right side) characters.  At most k
    characters leave each string and what remains is IDENTICAL — so both
    deletion neighborhoods of order k contain that common string.

    Pairs are generated as (i, j) with ``i = 0`` meaning "no first
    deletion" and double deletions requiring ``j > i`` — pure
    explode + substring codegen, no interpreted higher-order functions.
    Rows longer than ``MAX_LEN_ORDER2`` raise rather than silently explode.
    """
    s = F.col(str_col)
    base = df.where(s.isNotNull()).select(F.col(id_col), s.alias("_s"))
    # fail loudly on oversized strings instead of materializing C(len,2) rows
    guard = F.when(
        F.length("_s") > MAX_LEN_ORDER2,
        F.raise_error(
            F.concat(
                F.lit(
                    f"deletion_variants_order2: string longer than "
                    f"{MAX_LEN_ORDER2} chars (use PassJoin segment blocking "
                    f"for long strings): "
                ),
                F.substring("_s", 1, 80),
            )
        ),
    ).otherwise(F.col("_s"))
    base = base.select(F.col(id_col), guard.alias("_s"))
    pairs = (
        base.select("*", F.explode(F.sequence(F.lit(0), F.length("_s"))).alias("_i"))
        .select("*", F.explode(F.sequence(F.lit(0), F.length("_s"))).alias("_j"))
        .where((F.col("_i") == 0) | (F.col("_j") > F.col("_i")))
    )
    i, j = F.col("_i"), F.col("_j")
    single = F.concat(
        F.expr("substring(_s, 1, _j - 1)"),
        F.expr("substring(_s, _j + 1, length(_s) - _j)"),
    )
    double = F.concat(
        F.expr("substring(_s, 1, _i - 1)"),
        F.expr("substring(_s, _i + 1, _j - _i - 1)"),
        F.expr("substring(_s, _j + 1, length(_s) - _j)"),
    )
    variant = (
        F.when((i == 0) & (j == 0), F.col("_s"))
        .when(i == 0, single)
        .otherwise(double)
    )
    return pairs.select(F.col(id_col), F.col("_s"), variant.alias("_variant"))


def _neighborhood(df: DataFrame, id_col: str, str_col: str, k: int) -> DataFrame:
    if k == 1:
        return deletion_variants(df, id_col, str_col)
    if k == 2:
        return deletion_variants_order2(df, id_col, str_col)
    raise ValueError(
        f"max_dist={k} not supported by FastSS neighborhoods (k in (1, 2)); "
        "edit_distance_pairs/join dispatch k >= 3 to PassJoin automatically"
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 1,
) -> DataFrame:
    """Record-linkage join: rows of ``left`` matched to rows of ``right``
    within ``levenshtein <= max_dist`` (the dirty-table -> canonical-table
    direction of entity resolution).

    Returns ``(left_id, right_id, left_str, right_str, dist)``. FastSS
    deletion-neighborhood blocking for ``max_dist`` in {1, 2} (linear
    variants, candidate equi-join on the variant key); ``max_dist >= 3``
    dispatches to ``passjoin_join`` (segment blocking — same output
    contract). Banded verification either way.
    """
    if len({left_id, left_str, right_id, right_str}) != 4:
        raise ValueError(
            "left/right id and string column names must be distinct in the "
            "output; alias one side before joining"
        )
    if max_dist >= 3:
        return passjoin_join(
            left, right, left_id, left_str, right_id, right_str, max_dist
        )
    a = _ensure_parallelism(
        _neighborhood(left, left_id, left_str, max_dist).select(
            F.col(left_id).alias("_lid"), F.col("_s").alias("_ls"), "_variant"
        )
    )
    b = _neighborhood(right, right_id, right_str, max_dist).select(
        F.col(right_id).alias("_rid"), F.col("_s").alias("_rs"), "_variant"
    )
    cand = a.join(b, ["_variant"]).select("_lid", "_rid", "_ls", "_rs").distinct()
    dist = F.levenshtein("_ls", "_rs", max_dist)
    return (
        cand.withColumn("_d", dist)
        .where(F.col("_d") >= 0)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.col("_ls").alias(left_str),
            F.col("_rs").alias(right_str),
            F.col("_d").cast("int").alias("dist"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Self similarity-join: all pairs with ``levenshtein <= max_dist``.

    Returns ``(id_a, id_b, name_a, name_b, dist)`` with ``id_a < id_b``.
    ``max_dist`` of 1 (order-1 deletion neighborhood, len+1 keys/row) or 2
    (order-2, ~len^2/2 keys/row — still linear in rows, bounded by
    ``MAX_LEN_ORDER2``); either way the candidate set is provably complete
    and the final banded-levenshtein filter makes emitted pairs exact.
    """
    if max_dist >= 3:
        return passjoin_pairs(df, id_col, str_col, max_dist)
    va = _neighborhood(df, id_col, str_col, max_dist)
    # The verify-side levenshtein runs inside the candidate join; when the
    # input arrives as one small-file scan partition that join would run on
    # a single task (measured ~4 s at sf0.1 on one core). Spread the PROBE
    # side across the scheduler parallelism — a no-op at production scale
    # where the scan already has more partitions than cores.
    a = _ensure_parallelism(
        va.select(
            F.col(id_col).alias("id_a"), F.col("_s").alias("name_a"), "_variant"
        )
    )
    b = va.select(
        F.col(id_col).alias("id_b"), F.col("_s").alias("name_b"), "_variant"
    )
    cand = (
        a.join(b, ["_variant"])
        .where(F.col("id_a") < F.col("id_b"))
        # a pair sharing several variants (e.g. equal strings share all of
        # them) must surface once, not once per shared variant
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b", max_dist)
    return (
        cand.withColumn("dist", dist)
        # threshold form returns -1 when the banded scan exceeds max_dist
        .where(F.col("dist") >= 0)
        .select(
            "id_a", "id_b", "name_a", "name_b", F.col("dist").cast("int").alias("dist")
        )
    )


def _segment_bounds(k: int, length_col: Column, i_col: Column):
    """1-based (start, length) of segment ``i`` when a string of length
    ``length_col`` is evenly partitioned into k+1 segments (PassJoin's
    partition scheme: the first ``len mod (k+1)`` segments are one char
    longer, so segment lengths differ by at most one)."""
    b = F.floor(length_col / (k + 1)).cast("int")
    r = (length_col % (k + 1)).cast("int")
    slen = F.when(i_col < r, b + 1).otherwise(b).cast("int")
    start = (
        F.lit(1)
        + F.when(i_col < r, i_col * (b + 1)).otherwise(
            r * (b + 1) + (i_col - r) * b
        )
    ).cast("int")
    return start, slen


def _passjoin_index(df: DataFrame, id_col: str, str_col: str, k: int,
                    id_out: str, name_out: str) -> DataFrame:
    """Index side: the k+1 even-partition segments of each string, keyed
    ``(_i, _L, _key)``."""
    base = df.where(F.col(str_col).isNotNull()).select(
        F.col(id_col).alias(id_out), F.col(str_col).alias(name_out)
    )
    seg_start, seg_len = _segment_bounds(k, F.length(name_out), F.col("_i"))
    return (
        _ensure_parallelism(base)
        .select(
            id_out, name_out,
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("_i"),
        )
        .select(
            id_out, name_out, "_i",
            F.length(name_out).alias("_L"),
            F.substring(F.col(name_out), seg_start, seg_len).alias("_key"),
        )
    )


def _passjoin_probe(df: DataFrame, id_col: str, str_col: str, k: int,
                    id_out: str, name_out: str) -> DataFrame:
    """Probe side: substrings at segment-compatible lengths (±k) and
    MULTI-MATCH-AWARE start positions (Li, Deng & Feng 2011, the
    position- + length-aware selection), deduped per key.

    For segment ``_i`` (0-based) of an indexed string of length ``_L``
    starting at ``_p``, a probe string of length n with Δ = n − _L only
    needs substrings starting at

        q ∈ [_p − _i, _p + _i] ∩ [_p + Δ − (k − _i), _p + Δ + (k − _i)]

    — the left interval because an optimal alignment of a pair within
    distance k has a matching segment with fewer than _i+1 edits before
    it (pigeonhole over the first _i+1 segments), the right because the
    suffix after the match absorbs the remaining k − _i edits and the
    total length difference. Lossless (the paper's Lemma: every pair
    within distance k still shares at least one in-window key) and
    measured ~5x fewer probe keys / candidates than the plain ±k window
    at k=3 on the name roster, same verified output."""
    base = df.where(F.col(str_col).isNotNull()).select(
        F.col(id_col).alias(id_out), F.col(str_col).alias("_s")
    )
    n = F.length("_s")
    pr = (
        base.select(
            id_out, "_s",
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("_i"),
        )
        .select(
            id_out, "_s", "_i",
            F.explode(
                F.sequence(F.greatest(n - k, F.lit(0)), n + k)
            ).alias("_L"),
        )
    )
    p_start, p_len = _segment_bounds(k, F.col("_L").cast("long"), F.col("_i"))
    pr = pr.select(
        id_out, "_s", "_i", "_L", p_start.alias("_p"), p_len.alias("_sl")
    )
    delta = F.length("_s") - F.col("_L").cast("int")
    rem = F.lit(k) - F.col("_i")
    lo = F.greatest(
        F.col("_p") - F.col("_i"),
        F.col("_p") + delta - rem,
        F.lit(1),
    )
    hi = F.least(
        F.col("_p") + F.col("_i"),
        F.col("_p") + delta + rem,
        F.length("_s") - F.col("_sl") + 1,
    )
    positions = (
        F.when(F.col("_sl") == 0, F.array(F.lit(1)))
        .when(lo <= hi, F.sequence(lo, hi))
        .otherwise(F.array().cast("array<int>"))
    )
    return (
        pr.select(
            id_out, "_s", "_i", "_L", "_sl",
            F.explode(positions).alias("_pos"),
        )
        .select(
            id_out,
            F.col("_s").alias(name_out),
            "_i", "_L",
            F.substring(F.col("_s"), F.col("_pos"), F.col("_sl")).alias("_key"),
        )
        .dropDuplicates([id_out, "_i", "_L", "_key"])
    )


def passjoin_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 3,
) -> DataFrame:
    """Self similarity-join for ARBITRARY edit-distance thresholds via
    PassJoin segment blocking (Li, Deng & Feng 2011 — public paper):
    ``levenshtein(a, b) <= k`` requires (pigeonhole over an optimal
    alignment: the <= k edits touch at most k of a's k+1 segments) that
    ``b`` contain at least one of ``a``'s k+1 even-partition segments
    VERBATIM, shifted by at most k positions, with ``|len(a) - len(b)|
    <= k``. So:

    - index side: each string emits its k+1 segments keyed by
      ``(segment_index, len, segment_text)`` — k+1 rows per string;
    - probe side: each string emits, for every segment index and every
      compatible indexed length L in ``[len-k, len+k]``, its substrings
      of the segment's length at start positions within ±k of the
      segment's start — at most ``(k+1) x (2k+1) x (2k+1)`` keys per
      string, CONSTANT in string length (unlike the order-2 deletion
      neighborhood's O(len²), which is why this is the k >= 3 method);
    - candidates join on the key (an equality shuffle, never all-pairs),
      then a banded ``levenshtein(a, b, k)`` verify makes results exact.

    Zero-length segments (strings shorter than k+1) key on the empty
    string within the same (index, length) bucket — those buckets are
    cliques of the sub-(k+1)-length population, which is exactly the set
    pigeonhole can't prune. Returns ``(id_a, id_b, name_a, name_b,
    dist)`` with ``id_a < id_b``. Everything below is explode +
    substring arithmetic — whole-stage codegen, no UDF.
    """
    k = int(max_dist)
    if k < 1:
        raise ValueError("max_dist must be >= 1")
    idx = _passjoin_index(df, id_col, str_col, k, "id_a", "name_a")
    probe = _passjoin_probe(df, id_col, str_col, k, "id_b", "name_b")
    joined = idx.join(probe, ["_i", "_L", "_key"]).where(
        F.col("id_a") != F.col("id_b")
    )
    a_lt = F.col("id_a") < F.col("id_b")
    cand = joined.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        F.when(a_lt, F.col("name_a")).otherwise(F.col("name_b")).alias("name_a"),
        F.when(a_lt, F.col("name_b")).otherwise(F.col("name_a")).alias("name_b"),
    ).dropDuplicates(["id_a", "id_b"])
    dist = F.levenshtein("name_a", "name_b", k)
    return (
        cand.withColumn("dist", dist)
        .where(F.col("dist") >= 0)
        .select(
            "id_a", "id_b", "name_a", "name_b",
            F.col("dist").cast("int").alias("dist"),
        )
    )


def passjoin_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 3,
) -> DataFrame:
    """Two-table PassJoin record linkage: rows of ``left`` matched to
    rows of ``right`` within ``levenshtein <= max_dist`` — the k >= 3
    counterpart of ``edit_distance_join``. The substring lemma is
    one-directional-complete (if ed(l, r) <= k, r contains one of l's
    segments), so LEFT indexes and RIGHT probes; same output contract as
    edit_distance_join."""
    k = int(max_dist)
    if k < 1:
        raise ValueError("max_dist must be >= 1")
    if len({left_id, left_str, right_id, right_str}) != 4:
        raise ValueError(
            "left/right id and string column names must be distinct in the "
            "output; alias one side before joining"
        )
    idx = _passjoin_index(left, left_id, left_str, k, "_lid", "_ls")
    probe = _passjoin_probe(right, right_id, right_str, k, "_rid", "_rs")
    cand = (
        idx.join(probe, ["_i", "_L", "_key"])
        .select("_lid", "_rid", "_ls", "_rs")
        .dropDuplicates(["_lid", "_rid"])
    )
    dist = F.levenshtein("_ls", "_rs", k)
    return (
        cand.withColumn("_d", dist)
        .where(F.col("_d") >= 0)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.col("_ls").alias(left_str),
            F.col("_rs").alias(right_str),
            F.col("_d").cast("int").alias("dist"),
        )
    )
