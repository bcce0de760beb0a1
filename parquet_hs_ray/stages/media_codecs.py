"""REAL media codecs with zero external dependencies.

The container has no image/audio libraries, but PNG is zlib + per-row
byte filters (both stdlib/numpy) and WAV is stdlib ``wave`` — so these
two formats get genuine decode/encode, upgrading the multimodal stages'
``decode_real=True`` path from an environment-gated stub to a working
transform for PNG images and PCM WAV audio. Formats that genuinely need
external codecs (JPEG, MP3, video containers) still raise
``NotImplementedError`` with an explicit message.

PNG scope: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced — the overwhelming majority of real PNGs. All
five scanline filters are supported; filters 0/1/2 are vectorized
(filter 1 is a per-channel modular prefix sum), 3/4 fall back to a
per-pixel loop (rare in encoder output, correct always).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CTYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_media(data: bytes) -> str:
    """'png' | 'wav' | 'jpeg' | 'unknown' from magic bytes."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = []
    w = h = ctype = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", chunk)
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
            if ctype not in _CTYPE_CHANNELS:
                raise NotImplementedError(f"PNG color type {ctype} (palette needs PLTE handling)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    ch = _CTYPE_CHANNELS[ctype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = rows[y, 1:]
        f = int(filters[y])
        if f == 0:
            cur = line.copy()
        elif f == 1:  # Sub: modular prefix sum per channel position
            cur = line.copy()
            for c in range(ch):
                cur[c::ch] = np.cumsum(cur[c::ch], dtype=np.uint64).astype(np.uint8)
        elif f == 2:  # Up
            cur = line + prev  # uint8 wraps, as the spec requires
        elif f == 3:  # Average — left-recurrence, per-pixel
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (int(line[x]) + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth — per-pixel
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
    return len(payload).to_bytes(4, "big") + typ + payload + crc.to_bytes(4, "big")


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (filter 0, non-interlaced)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    lines = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(lines, 6))
            + _chunk(b"IEND", b""))


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (the classic index-sampling kernel)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[ys][:, xs]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_samples, n_channels) int16 array, sample_rate)."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        n, ch, width, rate = f.getnframes(), f.getnchannels(), f.getsampwidth(), f.getframerate()
        if width != 2:
            raise NotImplementedError(f"WAV sample width {width} (only 16-bit PCM)")
        pcm = np.frombuffer(f.readframes(n), dtype="<i2").reshape(-1, ch)
    return pcm, rate


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """(n, ch) int16 -> 16-bit PCM WAV bytes."""
    import wave

    pcm = np.asarray(pcm, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(pcm.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def image_features(img: np.ndarray, n_bytes: int) -> np.ndarray:
    """8-dim real image features: [n_bytes, kind=1, H, W, C, mean, std,
    mean |horizontal gradient|] (float32)."""
    h, w, c = img.shape
    g = img.astype(np.float32)
    grad = np.abs(np.diff(g, axis=1)).mean() if w > 1 else 0.0
    return np.asarray(
        [n_bytes, 1.0, h, w, c, g.mean(), g.std(), grad], dtype=np.float32)


def audio_features(pcm: np.ndarray, rate: int, n_bytes: int) -> np.ndarray:
    """8-dim real audio features: [n_bytes, kind=2, n_samples, rate,
    channels, rms, zero-crossing rate, peak] (float32)."""
    x = pcm.astype(np.float32)
    mono = x.mean(axis=1) if x.size else np.zeros(1, np.float32)
    rms = float(np.sqrt(np.mean(mono ** 2))) if mono.size else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
    peak = float(np.abs(mono).max()) if mono.size else 0.0
    return np.asarray(
        [n_bytes, 2.0, pcm.shape[0], rate, pcm.shape[1], rms, zcr, peak],
        dtype=np.float32)


_DCT32 = None


def _dct_basis(n: int = 32) -> np.ndarray:
    """DCT-II basis matrix (row u, col x) — cached, float64,
    deterministic."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)
        _DCT32 = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    return _DCT32


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash (classic pHash): integer luma -> 32x32
    nearest resize -> 2-D DCT-II -> low-frequency 8x8 block (DC dropped)
    thresholded at its median.  Near-identical images land within a few
    hamming bits; the hash is deterministic (no float RNG, integer luma).
    """
    if img.ndim == 3:
        g = (299 * img[..., 0].astype(np.int64)
             + 587 * img[..., 1].astype(np.int64)
             + 114 * img[..., 2].astype(np.int64)) // 1000
    else:
        g = img.astype(np.int64)
    g = resize_nearest(g, 32, 32).astype(np.float64)
    d = _dct_basis(32)
    coef = d @ g @ d.T
    block = coef[:8, :8].ravel()[1:]  # 63 low-freq coefficients, skip DC
    bits = block > np.median(block)
    packed = np.packbits(np.append(bits, False), bitorder="little")
    return int.from_bytes(packed.tobytes(), "little")


def audio_fingerprint64(pcm: np.ndarray, rate: int) -> int:
    """64-bit robust audio hash (Haitsma-Kalker shape): mono signal ->
    9 equal time frames -> per-frame FFT magnitude -> 9 log band
    energies -> sign of the band-difference-of-frame-difference
    ``(E[f+1,b]-E[f+1,b+1]) - (E[f,b]-E[f,b+1])`` over 8x8 (frame, band)
    cells.  Log-energy differences cancel amplitude scaling, so volume
    changes and re-encodes land within a few hamming bits.  Deterministic
    (no RNG, fixed frame/band splits); ``rate`` is accepted for signature
    symmetry but the hash is frame-relative."""
    x = pcm.astype(np.float64)
    mono = x.mean(axis=1) if x.ndim == 2 else x
    n_frames, n_bands = 9, 9
    n = len(mono)
    if n < n_frames * 2 * n_bands:  # too short for spectral framing:
        mono = np.resize(mono, n_frames * 2 * n_bands)
        n = len(mono)
    flen = n // n_frames
    frames = mono[:flen * n_frames].reshape(n_frames, flen)
    mag = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]  # drop DC
    # 9 equal frequency bands per frame
    nb = mag.shape[1] // n_bands
    bands = mag[:, :nb * n_bands].reshape(n_frames, n_bands, nb)
    e = np.log(bands.sum(axis=2) + 1e-12)  # (frames, bands)
    d = e[:, :-1] - e[:, 1:]               # adjacent band differences
    bits = (d[1:, :] - d[:-1, :]) > 0      # (8, 8) frame differences
    packed = np.packbits(bits.reshape(-1), bitorder="little")
    return int.from_bytes(packed.tobytes(), "little")
