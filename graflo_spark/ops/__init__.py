"""LLM-data-pipeline operators (beyond the reference surface, per the
north star in BASELINE.json): deduplication, similarity search, text
analysis, multimodal column plumbing — all designed for 100 TB scale."""
