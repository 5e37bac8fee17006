"""Checkpoint / lineage state (SURVEY §4)."""
