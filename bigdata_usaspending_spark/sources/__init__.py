"""Ingest sources: paginated REST client, geocoder, bulk parquet loader."""
