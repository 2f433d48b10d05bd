"""Relational + incremental operators (SURVEY.md §2.4-2.10)."""
