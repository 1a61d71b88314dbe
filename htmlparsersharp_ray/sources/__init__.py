"""Input sources: synthetic transcript tables + parquet readers."""
