"""Structured Streaming layer: the reference's changelog/merge semantics
as live streams (SURVEY §2.A R3/R4; batch-first expressions lift here)."""
