"""Structured Streaming shell: stateless per-micro-batch enrichment and
the one stateful op the domain needs (windowed per-key history)."""
