"""Structured Streaming wrappers for the ingest pipeline (SURVEY.md §3)."""
