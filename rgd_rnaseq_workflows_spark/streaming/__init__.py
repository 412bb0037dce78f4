"""Structured Streaming extensions (SURVEY §2.9: the reference is strictly
batch; these cover incremental ingestion of the same tables)."""
