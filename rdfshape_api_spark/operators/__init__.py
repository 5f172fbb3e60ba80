"""Operator algebra over the triples DataFrame (SURVEY §2.3-§2.5, §2.8)."""
