"""Embedding-table queries: cosine similarity search, LSH variants."""
