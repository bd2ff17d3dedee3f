"""Spark DataFrame operators re-realizing the reference's public API."""
