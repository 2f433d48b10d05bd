"""Ingest connectors (SURVEY.md §2.1): distributed parses over a
landing zone, with declared schemas and fail-fast validation."""
