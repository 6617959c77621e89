"""Structured Streaming surface (SURVEY.md §2.9 T4–T5, §7 phase 5).

Design: one algebra, two execution modes. Each transformation here
takes a DataFrame that may be batch OR streaming and applies the same
logical plan — the batch twins in ``operators/temporal.py`` are what
the DuckDB oracle checks; these run the identical logic incrementally
with watermarked state.
"""
