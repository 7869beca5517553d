"""Scalar expression library (SURVEY.md §2.6, F1-F16)."""
