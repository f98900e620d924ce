"""Incremental / Structured Streaming variants of the indexing pipeline."""
