"""Operator modules; importing them populates the query registry."""
