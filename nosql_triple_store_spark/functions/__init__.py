"""Reusable column-level / DataFrame-level building blocks."""
