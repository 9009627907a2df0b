"""Deduplication + text-analysis queries (north-star extension) over
``documents``. Populated incrementally."""
