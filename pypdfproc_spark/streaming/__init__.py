"""Structured Streaming ingestion for the extraction pipeline."""
