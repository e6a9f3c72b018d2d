"""LLM-data-pipeline extension operators (beyond the reference surface,
per the BASELINE.json north star): dedup, text analysis, similarity
search, multimodal column handling."""
