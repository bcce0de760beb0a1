"""Pure codec kernels (numpy/pyarrow only — no Ray imports)."""
