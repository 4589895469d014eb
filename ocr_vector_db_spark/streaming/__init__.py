"""Structured Streaming extensions (beyond reference parity — the reference
is batch-only; SURVEY §2.13)."""
