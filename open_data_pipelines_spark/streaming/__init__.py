"""Structured Streaming equivalents (SURVEY.md §2.10).

The reference's "streaming" is bounded-memory chunked HTTP ingest —
batch by nature. These modules provide the idiomatic continuous
counterparts (marked as engine extensions): file-arrival sources,
event-time windows with watermarks, and stateful latest-per-key.
"""
