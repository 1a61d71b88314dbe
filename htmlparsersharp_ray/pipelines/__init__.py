"""End-to-end pipelines (extraction flagship + relational/dedup demos)."""
