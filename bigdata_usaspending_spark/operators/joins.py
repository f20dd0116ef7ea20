"""Join operators (SURVEY.md §2.3).

The reference's single join shape is dim ⋈ fact on one named key
(app/spark_cassandra_etl_award_amount_aggregator.py:81-82) where the dim has
<=10 rows. We generalize it and make the broadcast explicit: at 100 TB the
fact side must never shuffle for a small-dim join, so dims get an explicit
``F.broadcast`` hint rather than relying on the autoBroadcastJoinThreshold
estimate surviving a scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_dim_fact(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """fact ⋈ dim with USING-column semantics (single deduped key column).

    ``how`` supports the full Spark join surface (inner/left/right/full/
    semi/anti); the reference only used inner, which doubles as a semi-join
    filter since the geo dim keys are a strict subset of fact keys.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)
