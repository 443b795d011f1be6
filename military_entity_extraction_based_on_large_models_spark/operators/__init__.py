"""Operators: extraction, linking, canonicalization, triples, dedup, judge, similarity."""
