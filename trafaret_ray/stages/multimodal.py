"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by actor-pool ``map_batches`` stages.

Decode support tiers:
  * REAL, dependency-free: PPM (P6) and uncompressed 24/32-bit BMP
    images (pure numpy header parse + nearest-neighbor resize), and
    PCM WAV audio (stdlib ``wave``).
  * REAL behind an import-try: PIL for compressed images (absent in
    this container — the ``__init__`` probes once per actor).
  * STUB fallback, clearly marked: a deterministic byte-derived fake
    that preserves shapes/dtypes so the Ray-side plumbing (schema,
    batch sizing, actor signature, output layout) stays testable.

Batch-size guidance: payloads are large; size ``batch_size`` so
batch_bytes × concurrency fits the worker heap (e.g. 64 images × 1 MB ×
8 actors ≈ 512 MB). Decoded tensors go out as fixed-size-list columns —
Arrow-native, zero-copy into numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# -- dependency-free codecs (PPM / BMP / WAV) -------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w = pixels.shape[:2]
    return b'P6\n%d %d\n255\n' % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_image_payload(payload: bytes):
    """Real decode for PPM (P6) and uncompressed 24/32-bit BMP; returns
    (h, w, 3) uint8 or None when the format is unrecognized."""
    if payload[:2] == b'P6':
        # header: P6 <ws> width <ws> height <ws> maxval <ONE ws> data.
        # Parse positionally — split() would also eat DATA bytes that
        # happen to be ASCII whitespace (0x20/0x09/0x0A...), truncating
        # ~2% of valid images.
        i, vals = 2, []
        n = len(payload)
        while len(vals) < 3 and i < n:
            while i < n and payload[i:i + 1].isspace():
                i += 1
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            if j == i:
                return None
            try:
                vals.append(int(payload[i:j]))
            except ValueError:
                return None
            i = j
        if len(vals) < 3:
            return None
        i += 1                      # exactly one whitespace after maxval
        w, h, maxval = vals
        need = w * h * 3
        # only 8-bit rasters decode on this tier; 16-bit (maxval > 255)
        # would misread as interleaved byte pairs — fall back instead
        if w <= 0 or h <= 0 or not (0 < maxval <= 255) \
                or len(payload) < i + need:
            return None
        return np.frombuffer(payload, dtype=np.uint8, count=need,
                             offset=i).reshape(h, w, 3)
    if payload[:2] == b'BM' and len(payload) >= 54:
        off = int.from_bytes(payload[10:14], 'little')
        w = int.from_bytes(payload[18:22], 'little', signed=True)
        h = int.from_bytes(payload[22:26], 'little', signed=True)
        bpp = int.from_bytes(payload[28:30], 'little')
        comp = int.from_bytes(payload[30:34], 'little')
        if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
            return None
        nch = bpp // 8
        stride = ((w * nch + 3) // 4) * 4
        rows = abs(h)
        if len(payload) < off + stride * rows:
            return None
        raw = np.frombuffer(payload, dtype=np.uint8,
                            count=stride * rows, offset=off)
        img = raw.reshape(rows, stride)[:, :w * nch]\
            .reshape(rows, w, nch)
        if h > 0:                       # bottom-up storage
            img = img[::-1]
        # BGR(A) -> RGB
        return np.ascontiguousarray(img[:, :, 2::-1][:, :, :3])
    return None


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    ys = (np.arange(out_h) * img.shape[0]) // out_h
    xs = (np.arange(out_w) * img.shape[1]) // out_w
    return img[ys][:, xs]


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float [-1, 1] mono -> PCM16 WAV bytes (stdlib wave)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((np.clip(samples, -1, 1) * 32767)
                      .astype(np.int16).tobytes())
    return buf.getvalue()


def decode_wav_payload(payload: bytes):
    """Real PCM WAV decode (stdlib): returns (float32 mono samples,
    sample_rate) or None when the payload is not a PCM WAV."""
    import io
    import wave
    if payload[:4] != b'RIFF':
        return None
    try:
        with wave.open(io.BytesIO(payload), 'rb') as w:
            nch, width, rate = (w.getnchannels(), w.getsampwidth(),
                                w.getframerate())
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    if width == 2:
        a = np.frombuffer(frames, dtype=np.int16).astype(np.float32) / 32768
    elif width == 1:
        a = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
             - 128) / 128
    else:
        return None
    if nch > 1:
        a = a.reshape(-1, nch).mean(axis=1)
    return a, rate

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

    Per payload: REAL dependency-free decode for PPM/BMP, then PIL (if
    importable — probed once per actor) for compressed formats, then the
    clearly-marked deterministic stub.
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

    def _decode_one(self, p: bytes) -> np.ndarray:
        img = decode_image_payload(p)
        if img is not None:
            return resize_nearest(img, self.out_w, self.out_h)
        if self._pil is not None:  # pragma: no cover - lib absent here
            import io
            return np.asarray(self._pil.open(io.BytesIO(p))
                              .convert('RGB')
                              .resize((self.out_w, self.out_h)))
        return _fake_pixels([p], self.out_w, self.out_h)[0]

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column('payload').to_pylist()
        pixels = np.stack([self._decode_one(p) for p in payloads])
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
        # pooled is EXACT: uint8 sums stay < 2^24 so f32 accumulation
        # cannot round regardless of order, and /npix (a power of two
        # here) is exact too
        pooled = flat.mean(axis=1)          # (n, 3)
        # explicit projection instead of `pooled @ proj`: BLAS sgemm
        # may contract with FMA (different rounding). Three f32
        # products (one defined rounding each), two f64 sums, ONE
        # final f32 cast — no native f32 additions anywhere, because
        # f32-add implementations legitimately differ in
        # double-rounding ties (numpy single-rounds; engines that
        # compute via double then narrow do not). The q_media_embed
        # SQL oracle mirrors this op sequence verbatim.
        t0 = pooled[:, 0:1] * self.proj[0]
        t1 = pooled[:, 1:2] * self.proj[1]
        t2 = pooled[:, 2:3] * self.proj[2]
        emb64 = t0.astype(np.float64) + t1
        emb64 = emb64 + t2
        emb = emb64.astype(np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), type=pa.float32()), emb.shape[1])
        return pa.table({'media_id': tbl.column('media_id'),
                         'embedding': col})


def decode_wav_pcm16_mono(payload: bytes):
    """PCM16 MONO WAV -> raw int16 samples (None for anything else) —
    the EXACT-arithmetic fast path: keeping samples integral lets the
    RMS ride an int64 sum of squares, so every downstream float op has
    an exact input and the result is order-independent bit-for-bit
    (and SQL-recomputable — the q_audio_energy oracle)."""
    import io
    import wave
    if payload[:4] != b'RIFF':
        return None
    try:
        with wave.open(io.BytesIO(payload), 'rb') as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                return None
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    return np.frombuffer(frames, dtype='<i2')


class AudioFeatures:
    """Actor stage: audio payload -> windowed RMS energies.

    REAL PCM-WAV decode via the stdlib; PCM16-mono clips take the
    EXACT path — per window, rms = sqrt(sum(s^2) / n) / 32768 with the
    sum in int64, a chain of exact-input IEEE ops whose f32 result is
    bit-reproducible in any summation order (this is what makes
    q_audio_energy byte-checkable against a SQL oracle). Other widths
    / channel counts use the float decode; non-WAV payloads fall back
    to the byte-window RMS stub (a real path for compressed codecs
    would be soundfile/librosa, absent here)."""

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
            s = decode_wav_pcm16_mono(p)
            if s is not None:
                m = max(1, len(s) // self.n_windows)
                win = np.resize(s.astype(np.int64),
                                (self.n_windows, m))
                sumsq = (win * win).sum(axis=1)
                feats[i] = np.sqrt(sumsq / m) / 32768.0
                continue
            dec = decode_wav_payload(p)
            if dec is not None:
                a, _rate = dec
            else:
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


def decode_pipeline(ds, concurrency: int = 4, batch_size: int = 64,
                    num_cpus: float = 0.5):
    """images: payload -> pixels -> embeddings, as two actor-pool stages
    (setup per actor, work per batch). ``num_cpus`` defaults to 0.5 so
    the two pools together reserve ``concurrency`` CPUs, leaving
    headroom for the upstream read tasks — at concurrency=2 under a
    4-CPU test session, four 1-CPU actors would starve the read into a
    deadlock."""
    decoded = ds.map_batches(DecodeImage, batch_format='pyarrow',
                             batch_size=batch_size,
                             concurrency=concurrency, num_cpus=num_cpus)
    return decoded.map_batches(ImageEmbed, batch_format='pyarrow',
                               batch_size=batch_size,
                               concurrency=concurrency,
                               num_cpus=num_cpus)
