"""Relational analytics surface (SURVEY.md §2.3 J6, §2.4 A6, §2.5 W2-W4,
§2.6 F14) over the TPC-H-ish fixture tables. Populated incrementally."""
