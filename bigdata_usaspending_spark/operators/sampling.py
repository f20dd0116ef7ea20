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
