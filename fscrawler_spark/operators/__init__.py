"""Relational/dataflow operators: politeness, dedup, link expansion, top-k."""
