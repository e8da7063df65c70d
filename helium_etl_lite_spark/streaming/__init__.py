"""Structured Streaming twin of the ingest pipeline."""
