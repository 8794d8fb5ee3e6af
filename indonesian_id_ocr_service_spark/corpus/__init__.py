"""Deterministic synthetic span-corpus generation (seed 42)."""
