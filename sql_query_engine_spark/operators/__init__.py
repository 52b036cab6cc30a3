"""Operator library (reference-parity relational ops)."""
