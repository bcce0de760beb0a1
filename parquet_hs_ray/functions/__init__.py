"""Vectorized per-batch functions (text analysis, hashing, sketches)."""
