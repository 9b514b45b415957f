"""Scalar function families (SURVEY.md §2 B34-B41)."""
