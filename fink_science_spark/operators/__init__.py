"""Multi-column / multi-table operators (joins, dedup, similarity,
aggregation, enrichment framework)."""
