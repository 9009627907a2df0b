"""End-to-end pipelines mirroring the reference's three run modes
(SURVEY.md §3): catalog sync, stops-map sync, run-log publish — composed
from the operator library, with sinks injected."""
