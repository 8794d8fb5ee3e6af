"""Output sinks: results, metrics, lineage/commit-log."""
