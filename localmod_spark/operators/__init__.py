"""Spark DataFrame operators: scoring, context, skew, dedup, similarity."""
