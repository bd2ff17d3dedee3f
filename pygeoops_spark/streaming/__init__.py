"""Structured Streaming surface for the spatial engine."""
