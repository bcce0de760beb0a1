"""Multimodal (image/audio/video) stage plumbing.

Payloads are opaque ``binary`` columns with typed metadata columns
(media_type, width/height/duration, ...). The Ray-side plumbing — actor
pool, small batch sizes for large payloads, Arrow binary in / fixed-width
feature vectors out, schema discipline — is real and tested.

``decode_real=True`` now does REAL decoding for PNG images and 16-bit
PCM WAV audio via the stdlib-only codecs in ``media_codecs.py`` (zlib +
scanline unfiltering; ``wave``) — features, resize and frame geometry
become genuine transforms for those formats. Formats that truly need
external libraries (JPEG, MP3, video containers) raise
``NotImplementedError`` per payload; the default fake path remains for
pipelines over arbitrary opaque bytes.

Scale notes: payloads are large (MBs/row) -> ``batch_size`` must be small
(tens of rows) and `DataContext.target_max_block_size` raised so Ray does
not split blocks absurdly; one actor per CPU with setup (model load) in
``__init__`` once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FEATURE_DIM = 8


def _binary_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(starts, lens, data) numpy views over a Binary/LargeBinary array —
    the zero-copy substrate for offset-sliced payload transforms. Null
    slots have len 0."""
    big = pa.types.is_large_binary(arr.type)
    off_dt, off_sz = (np.int64, 8) if big else (np.int32, 4)
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dt, count=len(arr) + 1,
                         offset=arr.offset * off_sz).astype(np.int64)
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, np.uint8)
    return offs[:-1], offs[1:] - offs[:-1], data


def _binary_from_parts(lens: np.ndarray, data: np.ndarray, validity=None) -> pa.Array:
    offsets = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)]).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(lens),
        [validity, pa.py_buffer(offsets), pa.py_buffer(np.ascontiguousarray(data))],
    )


class MediaFeatureStage:
    """Actor-pool map_batches class: binary payload -> feature vector.

    Use: ds.map_batches(MediaFeatureStage, fn_constructor_kwargs=dict(
    payload_col="payload"), batch_size=32, concurrency=N, batch_format="pyarrow")
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 decode_real: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.decode_real = decode_real
        # deterministic mixing constants (the 'model' of the fake path);
        # stage setup happens here ONCE PER ACTOR either way
        self._mix = np.arange(1, _FEATURE_DIM + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def _real_features(self, payloads: pa.Array) -> np.ndarray:
        """PNG/WAV payloads -> real 8-dim features (media_codecs)."""
        from . import media_codecs as mc

        starts, lens, data = _binary_view(payloads)
        feats = np.zeros((len(lens), _FEATURE_DIM), dtype=np.float32)
        for i in range(len(lens)):
            raw = data[starts[i] : starts[i] + lens[i]].tobytes()
            kind = mc.sniff_media(raw)
            if kind == "png":
                feats[i] = mc.image_features(mc.decode_png(raw), lens[i])
            elif kind == "wav":
                pcm, rate = mc.decode_wav(raw)
                feats[i] = mc.audio_features(pcm, rate, lens[i])
            else:
                raise NotImplementedError(
                    f"payload {i}: format {kind!r} needs external codec "
                    "libraries not present in this environment (PNG and "
                    "16-bit PCM WAV decode natively)"
                )
        return feats

    def _fake_features(self, payloads: pa.Array) -> np.ndarray:
        """Deterministic per-payload feature vector: byte-sum, length and
        mixed prefix hashes — vectorized over the batch."""
        offs = np.frombuffer(payloads.buffers()[1], dtype=np.int32 if not pa.types.is_large_binary(payloads.type) else np.int64,
                             count=len(payloads) + 1, offset=payloads.offset * (8 if pa.types.is_large_binary(payloads.type) else 4))
        buf = payloads.buffers()[2]
        data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, np.uint8)
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
        n = len(lens)
        feats = np.zeros((n, _FEATURE_DIM), dtype=np.float32)
        if n == 0:
            return feats
        csum = np.concatenate([np.zeros(1, np.int64), np.cumsum(data, dtype=np.int64)])
        sums = csum[offs[1:]] - csum[offs[:-1]]
        feats[:, 0] = lens
        feats[:, 1] = sums / np.maximum(lens, 1)
        # prefix-hash features
        for k in range(2, _FEATURE_DIM):
            take = np.minimum(lens, k).astype(np.int64)
            first = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                has = take > j
                idx = offs[:-1][has] + j
                first[has] = (first[has] * np.uint64(131)) + data[idx].astype(np.uint64)
            feats[:, k] = (first * self._mix[k - 2] >> np.uint64(40)).astype(np.float32)
        return feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].combine_chunks()
        feats = self._real_features(payloads) if self.decode_real \
            else self._fake_features(payloads)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_bytes": pa.array(feats[:, 0].astype(np.int64)),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), _FEATURE_DIM
                ),
            }
        )


def media_features(ds, payload_col="payload", id_col="media_id", concurrency=4, batch_size=32):
    """Run the feature stage as an actor pool (small batches for big rows)."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col},
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        batch_format="pyarrow",
    )


class ImageResizeStage:
    """Actor-pool stage for image resize: binary payload in, binary
    payload + dims out.

    ``decode_real=True``: PNG payloads are ACTUALLY decoded (stdlib zlib
    + unfiltering), nearest-neighbor resampled to (width, height) and
    re-encoded as PNG — a genuine image transform with no external
    libraries. Non-PNG formats raise NotImplementedError (JPEG etc. need
    codec libraries this container lacks). The default fake path
    truncates payload bytes to the target 'area' so pipelines over
    arbitrary opaque payloads stay testable."""

    def __init__(self, width: int = 224, height: int = 224, decode_real: bool = False):
        self.decode_real = decode_real
        self.width = width
        self.height = height

    def _real_resize(self, batch: pa.Table, payloads: pa.Array) -> pa.Table:
        from . import media_codecs as mc

        starts, lens, data = _binary_view(payloads)
        out = []
        for i in range(len(lens)):
            raw = data[starts[i] : starts[i] + lens[i]].tobytes()
            if mc.sniff_media(raw) != "png":
                raise NotImplementedError(
                    "only PNG resize is available natively; other image "
                    "formats need codec libraries absent here")
            img = mc.resize_nearest(mc.decode_png(raw), self.width, self.height)
            out.append(mc.encode_png(img))
        return pa.table({
            "media_id": batch["media_id"],
            "payload": pa.array(out, pa.binary()),
            "width": pa.array(np.full(len(out), self.width, dtype=np.int32)),
            "height": pa.array(np.full(len(out), self.height, dtype=np.int32)),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].combine_chunks()
        if self.decode_real:
            return self._real_resize(batch, payloads)
        area = self.width * self.height
        # offset slicing, no per-row as_py loop: truncate = ragged gather
        starts, lens, data = _binary_view(payloads)
        new_lens = np.minimum(lens, area)
        from ..codecs.hybrid_columnar import _ragged_indices

        if payloads.null_count:
            # rebuild validity at offset 0 (the source bitmap is bit-shifted
            # for sliced arrays; reusing its buffer would misalign)
            valid = pa.compute.is_valid(payloads).to_numpy(zero_copy_only=False)
            validity = pa.py_buffer(np.packbits(valid, bitorder="little"))
        else:
            validity = None
        out = _binary_from_parts(new_lens, data[_ragged_indices(starts, new_lens)],
                                 validity=validity)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": out,
                "width": pa.array(np.full(len(batch), self.width, dtype=np.int32)),
                "height": pa.array(np.full(len(batch), self.height, dtype=np.int32)),
            }
        )


class FrameSampleStage:
    """Actor-pool stage for temporal sampling: one input row -> n_frames
    output rows.

    ``decode_real=True``: WAV payloads are decoded (stdlib) and split
    into n_frames equal PCM segments, each re-encoded as a standalone
    WAV — real temporal sampling of real audio. Video containers raise
    NotImplementedError (no video codec exists in this environment). The
    default fake path emits payload byte slices so the one-row-to-many
    plumbing stays testable over opaque bytes."""

    def __init__(self, n_frames: int = 4, decode_real: bool = False):
        self.decode_real = decode_real
        self.n_frames = n_frames

    def _real_frames(self, batch: pa.Table, payloads: pa.Array) -> pa.Table:
        from . import media_codecs as mc

        starts, lens, data = _binary_view(payloads)
        ids, fidx, frames = [], [], []
        id_vals = batch["media_id"].to_pylist()
        for i in range(len(lens)):
            raw = data[starts[i] : starts[i] + lens[i]].tobytes()
            if mc.sniff_media(raw) != "wav":
                raise NotImplementedError(
                    "native temporal sampling supports WAV audio; video "
                    "containers need codec libraries absent here")
            pcm, rate = mc.decode_wav(raw)
            bounds = (np.arange(self.n_frames + 1) * len(pcm)) // self.n_frames
            for k in range(self.n_frames):
                ids.append(id_vals[i])
                fidx.append(k)
                frames.append(mc.encode_wav(pcm[bounds[k]:bounds[k + 1]], rate))
        return pa.table({
            "media_id": pa.array(ids, batch["media_id"].type),
            "frame_index": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].combine_chunks()
        if self.decode_real:
            return self._real_frames(batch, payloads)
        n, F = len(payloads), self.n_frames
        starts, lens, data = _binary_view(payloads)
        step = np.maximum(1, lens // F)  # (n,)
        k = np.arange(F, dtype=np.int64)
        f_start = (starts[:, None] + k[None, :] * step[:, None]).reshape(-1)
        f_len = np.clip(lens[:, None] - k[None, :] * step[:, None], 0,
                        step[:, None]).reshape(-1)
        from ..codecs.hybrid_columnar import _ragged_indices

        frames = _binary_from_parts(f_len, data[_ragged_indices(f_start, f_len)])
        ids = batch["media_id"].combine_chunks().take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), F))
        )
        return pa.table(
            {
                "media_id": ids,
                "frame_index": pa.array(np.tile(k.astype(np.int32), n)),
                "frame": frames,
            }
        )


class ImagePHashStage:
    """Actor-pool stage: decode PNG payloads and emit a 64-bit perceptual
    hash per image (``media_codecs.phash64``: luma -> 32x32 -> 2-D DCT ->
    median-thresholded low-frequency block).

    The per-image loop is inherent — PNG scanline unfiltering is
    per-image state — but each iteration is the vectorized zlib/numpy
    decode plus two 32x32 matmuls, not per-pixel Python.  Non-PNG and
    NULL payloads are silently skipped (their ids simply don't appear in
    the signature set); ``strict=True`` raises on the first one
    instead."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 strict: bool = False):
        from .media_codecs import decode_png, phash64, sniff_media

        self.payload_col, self.id_col, self.strict = payload_col, id_col, strict
        self._decode, self._phash, self._sniff = decode_png, phash64, sniff_media

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_in = t.column(self.id_col)
        payloads = t.column(self.payload_col).combine_chunks()
        ids, hashes = [], []
        for i in range(len(t)):
            data = payloads[i].as_py()
            if data is None or self._sniff(data) != "png":
                if self.strict:
                    raise ValueError(
                        f"non-PNG payload at {self.id_col}="
                        f"{ids_in[i].as_py()!r} (strict=True)")
                continue
            hashes.append(self._phash(self._decode(data)))
            ids.append(ids_in[i].as_py())
        sig = np.asarray(hashes, dtype=np.uint64).view(np.int64)
        return pa.table({self.id_col: pa.array(ids, ids_in.type),
                         "phash": pa.array(sig, pa.int64())})


def image_phash(ds, payload_col="payload", id_col="media_id",
                concurrency=4, batch_size=64, strict=False):
    """(id, phash int64) signatures for every PNG payload in ``ds``."""
    return ds.map_batches(
        ImagePHashStage, fn_constructor_kwargs=dict(
            payload_col=payload_col, id_col=id_col, strict=strict),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def image_phash_dedup(ds, payload_col="payload", id_col="media_id",
                      max_hamming: int = 3, concurrency=4, batch_size=64):
    """Near-duplicate IMAGE pairs: perceptual hashes (actor-pool decode)
    fed through the generic 4x16-bit signature banding
    (``dedup.signature_neardup_pairs``) — re-encoded / lightly edited
    copies land within a few hamming bits, and only (id, phash) rows
    ever shuffle, never pixels."""
    from ..pipelines.dedup import signature_neardup_pairs

    sigs = image_phash(ds, payload_col, id_col, concurrency, batch_size)
    return signature_neardup_pairs(sigs, id_col=id_col, sig_col="phash",
                                   max_hamming=max_hamming)


class AudioFingerprintStage:
    """Actor-pool stage: decode WAV payloads and emit a 64-bit robust
    spectral fingerprint (``media_codecs.audio_fingerprint64``) per clip.
    Volume changes and re-encodes land within a few hamming bits.
    Non-WAV / NULL payloads skip (or raise under ``strict``), mirroring
    :class:`ImagePHashStage`."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 strict: bool = False):
        from .media_codecs import audio_fingerprint64, decode_wav, sniff_media

        self.payload_col, self.id_col, self.strict = payload_col, id_col, strict
        self._decode, self._fp, self._sniff = decode_wav, audio_fingerprint64, sniff_media

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_in = t.column(self.id_col)
        payloads = t.column(self.payload_col).combine_chunks()
        ids, hashes = [], []
        for i in range(len(t)):
            data = payloads[i].as_py()
            if data is None or self._sniff(data) != "wav":
                if self.strict:
                    raise ValueError(
                        f"non-WAV payload at {self.id_col}="
                        f"{ids_in[i].as_py()!r} (strict=True)")
                continue
            pcm, rate = self._decode(data)
            hashes.append(self._fp(pcm, rate))
            ids.append(ids_in[i].as_py())
        sig = np.asarray(hashes, dtype=np.uint64).view(np.int64)
        return pa.table({self.id_col: pa.array(ids, ids_in.type),
                         "afp": pa.array(sig, pa.int64())})


def audio_fingerprint_dedup(ds, payload_col="payload", id_col="media_id",
                            max_hamming: int = 3, concurrency=4,
                            batch_size=64):
    """Near-duplicate AUDIO pairs: spectral fingerprints (actor-pool
    decode) through the generic 4x16-bit signature banding — only
    (id, fingerprint) rows shuffle, never samples."""
    from ..pipelines.dedup import signature_neardup_pairs

    sigs = ds.map_batches(
        AudioFingerprintStage, fn_constructor_kwargs=dict(
            payload_col=payload_col, id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)
    return signature_neardup_pairs(sigs, id_col=id_col, sig_col="afp",
                                   max_hamming=max_hamming)
