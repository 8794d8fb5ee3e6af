"""Structured Streaming surface for the extraction pipeline."""
