"""Spark operators: chunking, extraction, merge, dedup, similarity, text analysis."""
