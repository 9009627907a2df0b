"""Similarity-search queries (north-star extension) over ``embeddings``.
Populated incrementally."""
