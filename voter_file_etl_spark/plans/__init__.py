"""Declared query surface — one module per SURVEY.md §2 category."""
