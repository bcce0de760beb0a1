"""End-to-end Ray Data pipelines (encode job, decode, verify, dedup, ...)."""
