"""Structured Streaming variants of the event-window surface (SURVEY.md
§2.7). The reference has no streaming; its idempotent rerun-the-diff batch
model (publish_to_catalog.py:261-288) maps to foreachBatch + merge here."""
