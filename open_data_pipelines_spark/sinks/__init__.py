"""Load operators (SURVEY.md §2.2): partitioned writers + run-metadata
logging."""
