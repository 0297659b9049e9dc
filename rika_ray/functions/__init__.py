"""Scalar / per-batch helper functions (SURVEY.md §2.7)."""
