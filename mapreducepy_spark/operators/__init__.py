"""Relational operator catalog (SURVEY.md §2.1–§2.9)."""
