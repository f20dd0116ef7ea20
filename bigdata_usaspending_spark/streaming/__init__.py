"""Structured Streaming variants of the batch rollups (SURVEY.md §2.9)."""
