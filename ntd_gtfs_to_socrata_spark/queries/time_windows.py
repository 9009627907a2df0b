"""Event-time window queries (SURVEY.md §2.7, batch form) over ``events``.
Populated incrementally."""
