"""Dataflow operators: similarity search, dedup, grouping, context expansion,
cascade deletes, metrics, parent synthesis."""
