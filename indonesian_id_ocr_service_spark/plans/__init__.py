"""Plan auditing helpers."""
