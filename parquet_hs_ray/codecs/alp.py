"""ALP float compression — lossless, vectorized, exception-patched.

Two schemes from the public paper "ALP: Adaptive Lossless floating-Point
Compression" (Afroozeh & Boncz, SIGMOD 2023):

* **classic ALP** — most real-world floats are decimals: ``v ≈ i *
  10^f / 10^e`` for small ``(e, f)`` found by sampled trial.  Each value
  becomes ``round(v * 10^e / 10^f)`` (an int64, handed to the existing
  integer codec family — FOR/PFOR/DELTA/bit-pack); values whose decode
  is not bit-identical are stored verbatim in an exception list.
* **ALP-RD (real doubles)** — for full-precision floats (embeddings,
  physics) the IEEE bits split at ``rbw``: the left part (sign,
  exponent, top mantissa bits — low cardinality on normalized data) is
  dictionary-coded, the right part is bit-packed raw.  Lossless by
  construction; unseen left patterns become exceptions.

The codec extends the engine's per-column family the same way FSST
extends strings (reference parquet-hs models only PLAIN floats —
`/root/reference/src/Parquet/Stream/Reader.hs:205-209` errors on
non-INT64/BYTE_ARRAY; this is a deliberate superset, selected only when
the sampled estimate beats PLAIN/DICT).

Frame layouts (inside the float payload, after the codec byte):

classic  : u8 e | u8 f | varint n_exc | exc_pos u32[] | exc_vals dtype[]
           | u8 inner_codec | varint len | <integer payload>
ALP-RD   : u8 rbw | varint card | dict u16[card] | varint n_exc
           | exc_pos u32[] | exc_left u16[] | packed codes | packed right
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_width_of, pack_bits_le, unpack_bits_le
from .varint import decode_varint, encode_varint

# 10^k is exactly representable in float64 for k <= 22
_F10 = 10.0 ** np.arange(0, 23)
_MAX_E = {8: 18, 4: 10}          # itemsize -> max decimal exponent tried
_SAFE_INT = float(1 << 51)       # |scaled| bound keeping float64 mult exact
_EXC_POS_DT = np.dtype("<u4")
_MAX_RD_DICT = 1024              # left-part dictionary cap (codes <= 10 bits)
_UINT_OF = {4: np.uint32, 8: np.uint64}


def _bits(vals: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(vals).view(_UINT_OF[vals.dtype.itemsize])


# ---------------------------------------------------------------- classic

def _combos(max_e: int) -> tuple[np.ndarray, np.ndarray]:
    es = np.concatenate([np.full(e + 1, e) for e in range(max_e + 1)])
    fs = np.concatenate([np.arange(e + 1) for e in range(max_e + 1)])
    return es, fs


_COMBOS = {m: _combos(m) for m in set(_MAX_E.values())}


def find_exponents(sample: np.ndarray) -> tuple[int, int]:
    """Sampled (e, f) search: minimize bit-width + exception cost.
    All ~190 combinations are tried in one (combos x sample) broadcast;
    the sample is re-capped to 256 values internally so callers may pass
    any size without paying a large trial."""
    sample = np.ascontiguousarray(sample[np.isfinite(sample)])
    if len(sample) > 256:
        sample = np.ascontiguousarray(sample[:: len(sample) // 256])
    n = len(sample)
    if n == 0:
        return 0, 0
    s = sample.astype(np.float64, copy=False)
    itemsize = sample.dtype.itemsize
    es, fs = _COMBOS.get(_MAX_E.get(itemsize, 18)) or _combos(18)
    me, mf = _F10[es][:, None], _F10[fs][:, None]  # (C, 1)
    with np.errstate(over="ignore", invalid="ignore"):
        scaled = s[None, :] * me / mf              # (C, n)
        ints = np.round(scaled)
        ok = np.abs(scaled) < _SAFE_INT
        dec = (ints * mf / me).astype(sample.dtype)
        ok &= dec.view(_UINT_OF[itemsize]) == _bits(sample)[None, :]
        n_ok = ok.sum(axis=1)
        rng = (np.max(np.where(ok, ints, -np.inf), axis=1)
               - np.min(np.where(ok, ints, np.inf), axis=1))
    # bit width of the FOR'd range, vectorized (log2 on rng+1 >= 1)
    w = np.ceil(np.log2(np.where(n_ok > 0, rng, 0) + 1))
    cost = np.where(n_ok > 0,
                    n * w / 8 + (n - n_ok) * (4 + itemsize), np.inf)
    if not np.isfinite(cost).any():
        return 0, 0
    i = int(np.argmin(cost))   # first minimum == old iteration order
    return int(es[i]), int(fs[i])


def encode_split(vals: np.ndarray, e: int | None = None, f: int | None = None
                 ) -> tuple[bytes, np.ndarray]:
    """Encode ``vals`` as (header bytes, int64 array). The caller packs
    the int array with whichever integer codec the selector picks."""
    if e is None or f is None:
        step = max(1, len(vals) // 256)
        e, f = find_exponents(vals[::step])
    v64 = vals.astype(np.float64, copy=False)
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = v64 * _F10[e] / _F10[f]
        ints = np.round(scaled)
        safe = np.isfinite(scaled) & (np.abs(scaled) < _SAFE_INT)
    ints_i = np.where(safe, ints, 0.0).astype(np.int64)
    dec = (ints_i.astype(np.float64) * _F10[f] / _F10[e]).astype(vals.dtype)
    ok = safe & (_bits(dec) == _bits(vals))
    exc_pos = np.flatnonzero(~ok).astype(_EXC_POS_DT)
    exc_vals = np.ascontiguousarray(vals[~ok])
    if len(exc_pos):
        # patch with a valid in-range filler so FOR/bit-width stays tight
        fill = ints_i[ok][0] if ok.any() else np.int64(0)
        ints_i[~ok] = fill
    head = (bytes([e, f]) + encode_varint(len(exc_pos))
            + exc_pos.tobytes() + exc_vals.tobytes())
    return head, ints_i


def decode_head(data: bytes, pos: int, dt: np.dtype
                ) -> tuple[int, int, np.ndarray, np.ndarray, int]:
    e, f = data[pos], data[pos + 1]
    pos += 2
    n_exc, pos = decode_varint(data, pos)
    exc_pos = np.frombuffer(data, dtype=_EXC_POS_DT, count=n_exc, offset=pos)
    pos += exc_pos.nbytes
    exc_vals = np.frombuffer(data, dtype=dt, count=n_exc, offset=pos)
    pos += exc_vals.nbytes
    return e, f, exc_pos, exc_vals, pos


def reconstruct(ints: np.ndarray, e: int, f: int, exc_pos: np.ndarray,
                exc_vals: np.ndarray, dt: np.dtype) -> np.ndarray:
    vals = (ints.astype(np.float64) * _F10[f] / _F10[e]).astype(dt)
    if len(exc_pos):
        vals[exc_pos] = exc_vals
    return vals


def estimate_classic(sample: np.ndarray, n: int) -> int | None:
    """Predicted encoded bytes for classic ALP on the full column, from
    a sample; None when the sample yields no encodable value."""
    if len(sample) == 0:
        return None
    e, f = find_exponents(sample)
    head, ints = encode_split(sample, e, f)
    n_exc_frac = (len(head) - 2 - len(encode_varint(0))) / max(
        (4 + sample.dtype.itemsize), 1) / len(sample)
    if n_exc_frac >= 0.5:
        return None
    lo, hi = int(ints.min()), int(ints.max())
    w = bit_width_of(hi - lo) if hi > lo else 1
    return int(n * w / 8 + n_exc_frac * n * (4 + sample.dtype.itemsize)) + 16


# ----------------------------------------------------------------- ALP-RD

def _rd_split(bits: np.ndarray, rbw: int) -> tuple[np.ndarray, np.ndarray]:
    dt = bits.dtype.type
    left = (bits >> dt(rbw)).astype(np.uint16)
    right = bits & dt((1 << rbw) - 1)
    return left, right


def find_rd_split(sample_bits: np.ndarray) -> int:
    """Pick the right-part bit width minimizing estimated bytes/value."""
    total_bits = sample_bits.dtype.itemsize * 8
    n = max(len(sample_bits), 1)
    best_rbw, best_cost = total_bits - 1, np.inf
    for lw in range(1, 17):
        rbw = total_bits - lw
        left, _ = _rd_split(sample_bits, rbw)
        uniq, counts = np.unique(left, return_counts=True)
        if len(uniq) > _MAX_RD_DICT:
            order = np.argsort(-counts, kind="stable")[:_MAX_RD_DICT]
            covered = int(counts[order].sum())
            card = _MAX_RD_DICT
        else:
            covered, card = int(counts.sum()), len(uniq)
        cw = bit_width_of(card - 1) if card > 1 else 0
        exc = n - covered
        cost = (n * (cw + rbw) / 8 + exc * 6 + card * 2) / n
        if cost < best_cost:
            best_rbw, best_cost = rbw, cost
    return best_rbw


def encode_rd(vals: np.ndarray, rbw: int | None = None) -> bytes:
    bits = _bits(vals)
    n = len(vals)
    if n == 0:
        return bytes([vals.dtype.itemsize * 8 - 1]) + encode_varint(0) + encode_varint(0)
    if rbw is None:
        step = max(1, n // 1024)
        rbw = find_rd_split(bits[::step])
    left, right = _rd_split(bits, rbw)
    uniq, counts = np.unique(left, return_counts=True)
    if len(uniq) > _MAX_RD_DICT:
        keep = np.sort(uniq[np.argsort(-counts, kind="stable")[:_MAX_RD_DICT]])
    else:
        keep = uniq                      # np.unique output is already sorted
    idx = np.searchsorted(keep, left)
    idx_c = np.minimum(idx, len(keep) - 1)
    found = keep[idx_c] == left
    codes = np.where(found, idx_c, 0).astype(np.uint16)
    exc_pos = np.flatnonzero(~found).astype(_EXC_POS_DT)
    exc_left = np.ascontiguousarray(left[~found])
    cw = bit_width_of(len(keep) - 1) if len(keep) > 1 else 0
    pad = (-n) % 8
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint16)])
        right = np.concatenate([right, np.zeros(pad, dtype=right.dtype)])
    return (bytes([rbw]) + encode_varint(len(keep)) + keep.tobytes()
            + encode_varint(len(exc_pos)) + exc_pos.tobytes()
            + exc_left.tobytes()
            + pack_bits_le(codes, cw) + pack_bits_le(right, rbw))


def decode_rd(data: bytes, pos: int, dt: np.dtype, n: int
              ) -> tuple[np.ndarray, int]:
    rbw = data[pos]
    pos += 1
    card, pos = decode_varint(data, pos)
    keep = np.frombuffer(data, dtype=np.uint16, count=card, offset=pos)
    pos += keep.nbytes
    n_exc, pos = decode_varint(data, pos)
    exc_pos = np.frombuffer(data, dtype=_EXC_POS_DT, count=n_exc, offset=pos)
    pos += exc_pos.nbytes
    exc_left = np.frombuffer(data, dtype=np.uint16, count=n_exc, offset=pos)
    pos += exc_left.nbytes
    if n == 0:
        return np.empty(0, dtype=dt), pos
    cw = bit_width_of(card - 1) if card > 1 else 0
    npad = n + ((-n) % 8)
    codes, pos = unpack_bits_le(data, cw, npad, pos, dtype=np.uint32)
    udt = _UINT_OF[np.dtype(dt).itemsize]
    right, pos = unpack_bits_le(data, rbw, npad, pos, dtype=udt)
    left = keep[codes[:n]].astype(udt)
    if n_exc:
        left[exc_pos] = exc_left
    bits = (left << udt(rbw)) | right[:n]
    return bits.view(dt), pos


def estimate_rd(sample: np.ndarray, n: int) -> int:
    if len(sample) == 0:
        return 1 << 62
    bits = _bits(np.ascontiguousarray(sample))
    rbw = find_rd_split(bits)
    left, _ = _rd_split(bits, rbw)
    uniq, counts = np.unique(left, return_counts=True)
    if len(uniq) > _MAX_RD_DICT:
        covered = int(np.sort(counts)[-_MAX_RD_DICT:].sum())
        card = _MAX_RD_DICT
    else:
        covered, card = int(counts.sum()), len(uniq)
    cw = bit_width_of(card - 1) if card > 1 else 0
    exc_frac = 1.0 - covered / len(sample)
    return int(n * (cw + rbw) / 8 + exc_frac * n * 6 + card * 2) + 16
