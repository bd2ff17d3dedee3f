"""Source/sink formats beyond parquet (GeoJSONSeq text interchange)."""
