"""Scalar-function surface corpus — filled in incrementally (SURVEY.md §2.9)."""
