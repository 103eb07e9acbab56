"""Maintenance tools (run from the repo root, not part of the query path)."""
