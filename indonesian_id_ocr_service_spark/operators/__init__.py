"""Document-level operators: classify, extract, post-process, dedup,
similarity, media."""
