"""Checkpoint / manifest / metrics state (SURVEY.md §4.2)."""
