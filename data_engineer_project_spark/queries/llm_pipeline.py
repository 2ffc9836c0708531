"""LLM training-data pipeline operators over documents/embeddings/events.
Populated incrementally (dedup, similarity search, text analysis)."""
