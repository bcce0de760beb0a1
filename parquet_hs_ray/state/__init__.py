"""Per-partition lineage/metrics manifest and checkpoint-resume state."""
