"""Scalar/aggregate function library (text normalization, bibliometric metrics)."""
