"""parquet_hs_ray — a Ray-Data-native per-column lightweight-compression
engine (dict, RLE/bit-packed hybrid, plain, FSST, frame-of-reference) with
codec auto-selection, over Parquet tables of pre-tokenized training
sequences.

Decode-side semantics are bit-identical to the reference decoder
(`/root/reference` = yigitozkavci/parquet-hs); the execution engine is
idiomatic Ray Data (Dataset -> map_batches over zero-copy Arrow, actor
pools for stateful encoders, per-partition lineage manifest with resume).
"""

__version__ = "0.1.0"
