"""Golden decoder vectors ported from the reference unit suite
(`/root/reference/tests/unit/Parquet/Decoder/Spec.hs:17-68`). These pin the
bit-level semantics of every kernel (FIXTURES.md F2)."""

import numpy as np
import pytest

from parquet_hs_ray.codecs.bitpack import (
    decode_bpbe,
    decode_bple,
    encode_bpbe,
    take_bytes_le,
)
from parquet_hs_ray.codecs.rle_hybrid import (
    decode_hybrid,
    decode_hybrid_single_run,
    decode_rle_run,
    encode_hybrid,
)
from parquet_hs_ray.codecs.varint import decode_varint, encode_varint


def test_bple_golden():
    # Spec.hs:17-19
    vals, pos = decode_bple(bytes([136, 198, 250]), width=3, scaled_run_len=1)
    assert vals.tolist() == [0, 1, 2, 3, 4, 5, 6, 7]
    assert pos == 3


def test_bple_padded_golden():
    # Spec.hs:21-34 — 4 input bytes, only 3 consumed, leftover [0]
    data = bytes([0x88, 0x46, 0x00, 0x00])
    vals, pos = decode_bple(data, width=3, scaled_run_len=1)
    assert vals.tolist() == [0, 1, 2, 3, 4, 0, 0, 0]
    assert pos == 3
    assert data[pos:] == bytes([0])


def test_bpbe_golden():
    # Spec.hs:36-40 — varint(3) ++ [5,57,119] @ width 3 -> [0..7], consumed 4
    data = encode_varint(3) + bytes([5, 57, 119])
    vals, pos = decode_bpbe(data, width=3)
    assert vals.tolist() == [0, 1, 2, 3, 4, 5, 6, 7]
    assert pos == 4


def test_bpbe_roundtrip():
    vals = np.array([0, 1, 2, 3, 4, 5, 6, 7], dtype=np.uint64)
    enc = encode_bpbe(vals, width=3)
    # header should be (1 group << 1) | 1 = 3, payload the golden bytes
    assert enc == encode_varint(3) + bytes([5, 57, 119])


def test_rle_golden():
    # Spec.hs:42-44 — width 3, run 4 from [1,2,3,4,5]: consume 1 byte
    data = bytes([1, 2, 3, 4, 5])
    vals, pos = decode_rle_run(data, width=3, run_len=4)
    assert vals.tolist() == [1, 1, 1, 1]
    assert pos == 1
    assert data[pos:] == bytes([2, 3, 4, 5])


def test_take_bytes_le_golden():
    # Spec.hs:46-52
    v, pos = take_bytes_le(bytes([136, 198, 250]), 3)
    assert (v, pos) == (16434824, 3)
    v, pos = take_bytes_le(bytes([136, 198, 250, 1, 2]), 3)
    assert (v, pos) == (16434824, 3)


def test_varint_golden():
    # Spec.hs:54-68
    assert encode_varint(624485) == bytes([0xE5, 0x8E, 0x26])
    v, pos = decode_varint(bytes([0xE5, 0x8E, 0x26]))
    assert (v, pos) == (624485, 3)
    v, pos = decode_varint(bytes([0xE5, 0x8E, 0x26, 1, 2]))
    assert (v, pos) == (624485, 3)


def test_varint_limit():
    with pytest.raises(ValueError):
        decode_varint(b"\x80" * 33)


def test_hybrid_single_run_matches_reference_shape():
    """The reference hybrid decodes exactly one run (Decoder.hs:119-135);
    our single-run port must agree with the multi-run decoder on
    single-run streams."""
    vals = np.arange(8, dtype=np.uint64) % 5
    enc = encode_hybrid(vals, width=3)
    full, _ = decode_hybrid(enc, 3, 8)
    single, _ = decode_hybrid_single_run(enc, 3, 8)
    assert full.tolist() == vals.tolist()
    assert single.tolist() == vals.tolist()
