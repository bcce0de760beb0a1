"""ALP / ALP-RD float codec tests — bit-exact roundtrips, exception
handling, selector routing, and compression-win assertions.

The reference engine has no float codec at all (PLAIN only,
`/root/reference/src/Parquet/Stream/Reader.hs:205-209`); ALP is the
engine's superset float path (SIGMOD 2023 scheme), so correctness here
is property/fuzz-based bit-equality, not reference parity.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_hs_ray.codecs import alp
from parquet_hs_ray.format import decode_array, encode_array
from parquet_hs_ray.selector import ALP, ALPRD, select_float_codec


def _bits_equal(a: np.ndarray, b: np.ndarray) -> bool:
    u = np.uint64 if a.dtype.itemsize == 8 else np.uint32
    return (np.ascontiguousarray(a).view(u).tobytes()
            == np.ascontiguousarray(b).view(u).tobytes())


# ------------------------------------------------------------- unit layer

def test_alp_classic_split_roundtrip_decimals():
    rng = np.random.default_rng(1)
    v = np.round(rng.uniform(-1e4, 1e4, 5000), 2)
    head, ints = alp.encode_split(v)
    e, f, exc_pos, exc_vals, pos = alp.decode_head(bytes(head), 0, v.dtype)
    assert pos == len(head)
    out = alp.reconstruct(ints, e, f, exc_pos, exc_vals, v.dtype)
    assert _bits_equal(out, v)
    # parsed 2-decimals need at most a handful of exceptions
    assert len(exc_pos) < len(v) * 0.01


def test_alp_classic_specials_are_exceptions():
    v = np.array([np.nan, np.inf, -np.inf, -0.0, 5e-324, 1.75, 1e300])
    head, ints = alp.encode_split(v)
    e, f, exc_pos, exc_vals, _ = alp.decode_head(bytes(head), 0, v.dtype)
    out = alp.reconstruct(ints, e, f, exc_pos, exc_vals, v.dtype)
    assert _bits_equal(out, v)          # NaN payload and -0.0 sign preserved


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31), n=st.integers(1, 400),
       decimals=st.integers(0, 6), f32=st.booleans())
def test_alp_classic_property(seed, n, decimals, f32):
    rng = np.random.default_rng(seed)
    v = np.round(rng.uniform(-1e6, 1e6, n), decimals)
    if f32:
        v = v.astype(np.float32)
    head, ints = alp.encode_split(v)
    e, f, exc_pos, exc_vals, _ = alp.decode_head(bytes(head), 0, v.dtype)
    assert _bits_equal(alp.reconstruct(ints, e, f, exc_pos, exc_vals, v.dtype), v)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31), n=st.integers(0, 500), f32=st.booleans(),
       scale=st.sampled_from([1e-3, 1.0, 1e8]))
def test_alp_rd_property(seed, n, f32, scale):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n) * scale
    if f32:
        v = v.astype(np.float32)
    payload = alp.encode_rd(v)
    out, pos = alp.decode_rd(bytes(payload), 0, v.dtype, n)
    assert pos == len(payload)
    assert _bits_equal(out, v)


def test_alp_rd_dict_overflow_exceptions():
    # force > _MAX_RD_DICT distinct left patterns at every split point:
    # full-range random bits make the left part nearly uniform
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2**64, 4000, dtype=np.uint64)
    v = bits.view(np.float64)
    payload = alp.encode_rd(v)
    out, _ = alp.decode_rd(bytes(payload), 0, v.dtype, len(v))
    assert _bits_equal(out, v)


# ----------------------------------------------------------- format layer

def test_selector_routes_decimals_to_alp_and_reals_to_rd():
    rng = np.random.default_rng(7)
    dec = np.round(rng.uniform(900, 105000, 20000), 2)
    cid, stats = select_float_codec(dec)
    assert cid == ALP and stats.codec == "alp"
    real = rng.standard_normal(20000)
    cid, stats = select_float_codec(real)
    assert cid == ALPRD and stats.codec == "alprd"


@pytest.mark.parametrize("dt", [np.float64, np.float32])
def test_frame_roundtrip_with_nulls(dt):
    rng = np.random.default_rng(11)
    v = np.round(rng.uniform(-50, 50, 3000), 3).astype(dt)
    mask = rng.random(3000) < 0.1
    arr = pa.array(v, mask=mask)
    frame, stats = encode_array(arr)
    out, _ = decode_array(bytes(frame), 0, arr.type)
    assert out.equals(arr)
    assert stats.codec in ("alp", "alprd", "dict")


def test_frame_roundtrip_forced_codecs():
    rng = np.random.default_rng(13)
    for cid in (ALP, ALPRD):
        for v in (rng.standard_normal(777),
                  np.round(rng.uniform(0, 1, 777), 4).astype(np.float32),
                  np.array([], dtype=np.float64)):
            arr = pa.array(v, type=pa.from_numpy_dtype(v.dtype))
            frame, _ = encode_array(arr, codec_override=cid)
            out, _ = decode_array(bytes(frame), 0, arr.type)
            assert out.equals(arr)


def test_alp_compresses_decimal_columns():
    """The selector's win must be real: 2-decimal prices ≥ 2x vs PLAIN,
    and random floats must not regress past PLAIN by more than the
    frame header."""
    rng = np.random.default_rng(17)
    prices = pa.array(np.round(rng.uniform(900, 105000, 50000), 2))
    frame, stats = encode_array(prices)
    assert stats.codec == "alp"
    assert len(frame) * 2 < 50000 * 8
    noise = pa.array(rng.standard_normal(50000))
    frame2, _ = encode_array(noise)
    assert len(frame2) <= 50000 * 8 + 64


def test_alp_embedding_fsl_child():
    """list<float32> embeddings route through the FSL child path."""
    rng = np.random.default_rng(19)
    emb = rng.standard_normal((500, 64)).astype(np.float32)
    arr = pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 64)
    frame, stats = encode_array(arr)
    out, _ = decode_array(bytes(frame), 0, arr.type)
    assert out.equals(arr)
    assert "alprd" in stats.codec or "plain" in stats.codec


def test_alp_truncation_raises():
    rng = np.random.default_rng(23)
    arr = pa.array(np.round(rng.uniform(0, 1, 2000), 2))
    frame, _ = encode_array(arr, codec_override=ALP)
    with pytest.raises((ValueError, IndexError)):
        decode_array(bytes(frame[: len(frame) // 2]), 0, arr.type)
