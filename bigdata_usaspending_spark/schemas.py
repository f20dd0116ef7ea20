"""Explicit StructType schemas for the awards domain.

The reference declared its schema in Cassandra DDL (cql/setup_usaspending.cql)
and let the connector infer Spark types at read time; it had no StructType
anywhere. We declare schemas once, schema-on-write.

Type upgrades vs the reference (SURVEY.md §1.2):
- money: CQL float (32-bit) -> DecimalType(18, 2). Float money is a reference
  defect (min award 0.02 in outputs/model_training_info.txt:5).
- coordinates: float -> DoubleType.
"""

from __future__ import annotations

from pyspark.sql import types as T

MONEY = T.DecimalType(18, 2)

# Fact table — one row per federal contract award
# (cql/setup_usaspending.cql:10-24).
AWARDS = T.StructType(
    [
        T.StructField("award_id", T.StringType(), nullable=False),
        T.StructField("recipient_name", T.StringType()),
        T.StructField("start_date", T.DateType()),
        T.StructField("end_date", T.DateType()),
        T.StructField("award_amount", MONEY),
        T.StructField("awarding_agency", T.StringType()),
        T.StructField("awarding_sub_agency", T.StringType()),
        T.StructField("contract_award_type", T.StringType()),
        T.StructField("funding_agency", T.StringType()),
        T.StructField("funding_sub_agency", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("last_modified_date", T.DateType()),
        T.StructField("base_obligation_date", T.DateType()),
    ]
)

# The 7 columns the ML pipeline requires non-null
# (app/machine_learning_models.py:136-145).
AWARDS_REQUIRED_COLUMNS = (
    "award_amount",
    "start_date",
    "awarding_agency",
    "awarding_sub_agency",
    "contract_award_type",
    "funding_agency",
    "funding_sub_agency",
)

# Geo enrichment dims (cql/setup_usaspending.cql:33-43); <=10 rows each.
def geo_dim(key: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(key, T.StringType(), nullable=False),
            T.StructField("latitude", T.DoubleType()),
            T.StructField("longitude", T.DoubleType()),
        ]
    )


RECIPIENT_GEO = geo_dim("recipient_name")
SUB_AGENCY_GEO = geo_dim("awarding_sub_agency")

# Ingest audit log (cql/setup_usaspending.cql:26-31; written app/ml_app.py:545-551).
DOWNLOAD_HISTORY = T.StructType(
    [
        T.StructField("download_id", T.StringType(), nullable=False),
        T.StructField("start_time", T.TimestampType()),
        T.StructField("end_time", T.TimestampType()),
        T.StructField("number_of_rows", T.IntegerType()),
    ]
)
