"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio libraries, so the DECODE KERNELS ARE
STUBBED: each stage tries its real library import in ``__init__`` (once
per actor) and otherwise uses a clearly-marked deterministic fake that
preserves shapes/dtypes — the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested.

Batch-size guidance: payloads are large; size ``batch_size`` so
batch_bytes × concurrency fits the worker heap (e.g. 64 images × 1 MB ×
8 actors ≈ 512 MB). Decoded tensors go out as fixed-size-list columns —
Arrow-native, zero-copy into numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ('media_id', pa.int64()),
    ('kind', pa.string()),            # image | audio | video
    ('payload', pa.binary()),
    ('width', pa.int32()),            # images/video
    ('height', pa.int32()),
    ('sample_rate', pa.int32()),      # audio
    ('n_frames', pa.int32()),         # video/audio samples
])


def synthetic_media_table(n: int = 64, seed: int = 0,
                          kind: str = 'image',
                          payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows (seeded binary payloads)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes,
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        'media_id': pa.array(np.arange(n, dtype=np.int64)),
        'kind': pa.array([kind] * n),
        'payload': pa.array(payloads, type=pa.binary()),
        'width': pa.array(np.full(n, 32, dtype=np.int32)),
        'height': pa.array(np.full(n, 32, dtype=np.int32)),
        'sample_rate': pa.array(np.full(n, 16000, dtype=np.int32)),
        'n_frames': pa.array(np.full(n, 16, dtype=np.int32)),
    })


def _fake_pixels(payloads: list[bytes], w: int, h: int) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels derived from the payload
    bytes (NOT a real image decode — marker for the missing PIL path)."""
    out = np.empty((len(payloads), h, w, 3), dtype=np.uint8)
    for i, p in enumerate(payloads):
        a = np.frombuffer(p, dtype=np.uint8)
        out[i] = np.resize(a, (h, w, 3))
    return out


class DecodeImage:
    """Actor stage: payload -> pixels (h, w, 3 uint8 as fixed-size list).

    Real path: PIL.Image.open — stubbed when PIL is absent.
    Use: ``ds.map_batches(DecodeImage, batch_format='pyarrow',
    batch_size=64, concurrency=N, num_cpus=1)``.
    """

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w, self.out_h = out_w, out_h
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None  # stub path

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column('payload').to_pylist()
        if self._pil is not None:  # pragma: no cover - lib absent here
            import io
            pixels = np.stack([
                np.asarray(self._pil.open(io.BytesIO(p))
                           .convert('RGB').resize((self.out_w, self.out_h)))
                for p in payloads])
        else:
            pixels = _fake_pixels(payloads, self.out_w, self.out_h)
        flat = pixels.reshape(len(payloads), -1)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.reshape(-1), type=pa.uint8()), flat.shape[1])
        return pa.table({
            'media_id': tbl.column('media_id'),
            'pixels': col,
            'width': pa.array(np.full(len(payloads), self.out_w,
                                      dtype=np.int32)),
            'height': pa.array(np.full(len(payloads), self.out_h,
                                       dtype=np.int32)),
        })


class ImageEmbed:
    """Actor stage: pixels -> embedding (model load once per actor).

    Real path: a vision model forward; stubbed to a deterministic random
    projection of mean-pooled pixels (fixed seed -> reproducible)."""

    def __init__(self, dim: int = 64, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((3, dim)).astype(np.float32)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        la = tbl.column('pixels').combine_chunks()
        n = len(la)
        flat = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.float32).reshape(n, -1, 3)
        pooled = flat.mean(axis=1)          # (n, 3)
        emb = pooled @ self.proj            # (n, dim)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), type=pa.float32()), emb.shape[1])
        return pa.table({'media_id': tbl.column('media_id'),
                         'embedding': col})


class AudioFeatures:
    """Actor stage: audio payload -> frame energies (stub: byte-window
    RMS; real path would be an soundfile/librosa decode + STFT)."""

    def __init__(self, n_windows: int = 16):
        self.n_windows = n_windows
        try:
            import soundfile  # noqa: F401
            self._sf = soundfile
        except ImportError:
            self._sf = None

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column('payload').to_pylist()
        feats = np.empty((len(payloads), self.n_windows), dtype=np.float32)
        for i, p in enumerate(payloads):
            a = np.frombuffer(p, dtype=np.uint8).astype(np.float32)
            win = np.resize(a, (self.n_windows,
                                max(1, len(a) // self.n_windows)))
            feats[i] = np.sqrt((win ** 2).mean(axis=1))
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.n_windows)
        return pa.table({'media_id': tbl.column('media_id'),
                         'energies': col})


class FrameSample:
    """Actor stage: video payload -> k sampled 'frames' (stub: byte
    slices; real path would be pyav/ffmpeg keyframe extraction)."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column('payload').to_pylist()
        ids, fidx, frames = [], [], []
        mids = tbl.column('media_id').to_pylist()
        for mid, p in zip(mids, payloads):
            step = max(1, len(p) // self.k)
            for j in range(self.k):
                ids.append(mid)
                fidx.append(j)
                frames.append(p[j * step:(j + 1) * step])
        return pa.table({
            'media_id': pa.array(ids, type=pa.int64()),
            'frame_idx': pa.array(fidx, type=pa.int32()),
            'frame': pa.array(frames, type=pa.binary()),
        })


def decode_pipeline(ds, concurrency: int = 4, batch_size: int = 64):
    """images: payload -> pixels -> embeddings, as two actor-pool stages
    (setup per actor, work per batch)."""
    decoded = ds.map_batches(DecodeImage, batch_format='pyarrow',
                             batch_size=batch_size,
                             concurrency=concurrency, num_cpus=1)
    return decoded.map_batches(ImageEmbed, batch_format='pyarrow',
                               batch_size=batch_size,
                               concurrency=concurrency, num_cpus=1)
