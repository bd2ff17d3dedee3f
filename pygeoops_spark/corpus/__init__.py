"""Deterministic corpus synthesis (input_hint schema) and
oracle-friendly geometry derivation from the driver's parquet tables."""
