"""bigdata_usaspending_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capability surface of
the reference application ``buddhiayesha2015/bigdata-usaspending`` (a PySpark
3.4 + Cassandra + Flask dashboard over US federal award data), re-expressed as
an idiomatic, 100-TB-scalable Spark engine:

- columnar Parquet storage instead of Cassandra wide rows,
- declarative DataFrame/SQL plans (Catalyst does pushdown/pruning/broadcast),
- distributed aggregation instead of driver-side Counter loops
  (reference: app/fetch_recipient_name_geo_data.py:99-105),
- server-side rollups instead of client-side JS re-aggregation
  (reference: templates/dashboard.html:148-189),
- bulk DataFrame writes instead of row-at-a-time inserts
  (reference: app/ml_app.py:488-509).

Layout:
- ``session``    — SparkSession factory with scale-oriented defaults
- ``catalog``    — star-schema table loaders (driver's synthetic testdata)
- ``schemas``    — explicit StructTypes for the awards domain
- ``operators/`` — pure DataFrame -> DataFrame relational operators
- ``functions/`` — scalar function helpers (safe casts, date parsing)
- ``plans/``     — composed query plans (rollup ETL, dashboard, oracle corpus)
- ``sources/``   — ingest clients (paginated REST, geocoder) + bulk loaders
- ``streaming/`` — Structured Streaming variants of the batch rollups
- ``ml/``        — the three MLlib pipelines + correlation analysis
"""

__version__ = "0.1.0"
