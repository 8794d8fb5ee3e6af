"""Corpus source registry."""
