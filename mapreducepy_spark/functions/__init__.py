"""Scalar function showcases (SURVEY.md §2.8)."""
