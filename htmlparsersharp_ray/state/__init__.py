"""Per-partition lineage / checkpoint records for resumable output."""
