"""Scalar / per-row function library (SURVEY §2.8) — all deterministic,
seedless (hash-based), and vectorised or batch-applied."""
