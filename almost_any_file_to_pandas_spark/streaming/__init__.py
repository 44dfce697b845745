"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.9); this package adds
the streaming restatements of the engine's aggregates: tumbling-window
counts, sessionization, and stateful dedup, each with a batch-
equivalent query registered for the DuckDB oracle (the streaming and
batch plans share the same column expressions, so the oracle checks
the semantics and the streaming tests check the plumbing).
"""
