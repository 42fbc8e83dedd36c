"""Spark operators: extraction, canonicalization, components, dedupe, ANN."""
