"""End-to-end pipelines (the reference's top-level entry points,
SURVEY §3), composed purely from Dataset transforms."""
