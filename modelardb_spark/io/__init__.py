"""Table catalog + per-partition checkpoint/lineage/metrics."""
