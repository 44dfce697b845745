"""Large-scale training-data pipeline operators.

The reference is ingestion-only (SURVEY.md §2.9); these operators are
the engine's extension surface for LLM-data work at 100 TB:
deduplication (:mod:`dedup`), similarity search (:mod:`similarity`),
text analysis (:mod:`textstats`), multimodal column plumbing
(:mod:`multimodal`). All hot paths are built-in column expressions or
Arrow-batched Pandas UDFs; nothing collects data to the driver.
"""
