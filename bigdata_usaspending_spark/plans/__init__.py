"""Composed query plans: the oracle-checked corpus, rollup ETL, dashboard."""
