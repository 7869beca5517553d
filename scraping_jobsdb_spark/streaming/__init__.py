"""Structured Streaming surface (SURVEY.md §2.7 extensions)."""
