"""Input sources: parquet readers + the deterministic pages generator."""
