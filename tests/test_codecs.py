"""Dependency-free media codecs: PPM/BMP image decode, WAV audio decode,
and the decode actor stages running them end-to-end."""

import numpy as np
import pyarrow as pa

from trafaret_ray.stages.multimodal import (
    AudioFeatures, DecodeImage, decode_image_payload, decode_wav_payload,
    encode_ppm, encode_wav, resize_nearest)


def _img(h=8, w=6, seed=1):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                                dtype=np.uint8)


def _bmp24(pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (bottom-up, BGR)."""
    h, w = pixels.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    header = (b'BM' + (54 + len(data)).to_bytes(4, 'little') + b'\x00' * 4
              + (54).to_bytes(4, 'little')
              + (40).to_bytes(4, 'little')
              + w.to_bytes(4, 'little') + h.to_bytes(4, 'little')
              + (1).to_bytes(2, 'little') + (24).to_bytes(2, 'little')
              + (0).to_bytes(4, 'little') + len(data).to_bytes(4, 'little')
              + b'\x00' * 16)
    return header + data


class TestImageCodecs:
    def test_ppm_roundtrip(self):
        px = _img()
        got = decode_image_payload(encode_ppm(px))
        assert (got == px).all()

    def test_bmp_roundtrip(self):
        px = _img(5, 7)
        got = decode_image_payload(_bmp24(px))
        assert (got == px).all()

    def test_unknown_format_returns_none(self):
        assert decode_image_payload(b'\x89PNG...') is None

    def test_ppm_whitespace_valued_first_pixel(self):
        # a first data byte of 0x20/0x0A must not be eaten as header ws
        px = np.full((2, 2, 3), 0x20, dtype=np.uint8)
        assert (decode_image_payload(encode_ppm(px)) == px).all()
        px[0, 0, 0] = 0x0A
        assert (decode_image_payload(encode_ppm(px)) == px).all()

    def test_resize_nearest_identity(self):
        px = _img(4, 4)
        assert (resize_nearest(px, 4, 4) == px).all()
        assert resize_nearest(px, 2, 8).shape == (8, 2, 3)


class TestWavCodec:
    def test_roundtrip(self):
        t = np.linspace(0, 1, 1600)
        sig = 0.5 * np.sin(2 * np.pi * 440 * t)
        dec = decode_wav_payload(encode_wav(sig, 16000))
        assert dec is not None
        samples, rate = dec
        assert rate == 16000
        assert len(samples) == 1600
        assert np.abs(samples - sig).max() < 1e-3

    def test_non_wav_returns_none(self):
        assert decode_wav_payload(b'not audio') is None


class TestDecodeStagesRealPayloads:
    def test_image_stage_decodes_ppm(self, ray_session):
        import ray.data as rd
        px = _img(16, 16, seed=3)
        tbl = pa.table({
            'media_id': pa.array([0], type=pa.int64()),
            'payload': pa.array([encode_ppm(px)], type=pa.binary()),
        })
        out = rd.from_arrow(tbl).map_batches(
            DecodeImage, batch_format='pyarrow', concurrency=1,
            fn_constructor_kwargs={'out_w': 16, 'out_h': 16}).to_pandas()
        got = np.array(out['pixels'][0]).reshape(16, 16, 3)
        assert (got == px).all()

    def test_audio_stage_decodes_wav(self, ray_session):
        import ray.data as rd
        quiet = encode_wav(np.zeros(1600), 16000)
        loud = encode_wav(np.ones(1600) * 0.9, 16000)
        tbl = pa.table({
            'media_id': pa.array([0, 1], type=pa.int64()),
            'payload': pa.array([quiet, loud], type=pa.binary()),
        })
        out = rd.from_arrow(tbl).map_batches(
            AudioFeatures, batch_format='pyarrow',
            concurrency=1).to_pandas()
        e_quiet = np.array(out['energies'][0])
        e_loud = np.array(out['energies'][1])
        assert e_quiet.max() < 0.01
        assert e_loud.min() > 0.5


class TestMediaQueries:
    """queries() entries for the multimodal paths (rows-only: binary
    codecs have no SQL oracle; determinism is the gate)."""

    SF = '/root/testdata/sf0.001'

    def test_media_embed_deterministic(self, ray_session):
        from trafaret_ray.pipelines.queries import QUERIES
        a = QUERIES['q_media_embed'](self.SF).to_pandas()
        b = QUERIES['q_media_embed'](self.SF).to_pandas()
        assert len(a) > 0 and a.equals(b)
        assert list(a.columns) == ['media_id', 'dim', 'norm', 'mean']
        assert (a['dim'] == 64).all() and (a['norm'] > 0).all()

    def test_audio_energy_sine_rms(self, ray_session):
        from trafaret_ray.pipelines.queries import QUERIES
        a = QUERIES['q_audio_energy'](self.SF).to_pandas()
        b = QUERIES['q_audio_energy'](self.SF).to_pandas()
        assert len(a) > 0 and a.equals(b)
        # windowed RMS of a pure sine stays near amp/sqrt(2), and the
        # synthetic amps live in [0.1, 0.9] -> rms in ~[0.07, 0.65]
        assert a['rms_mean'].between(0.05, 0.70).all()
        assert (a['rms_peak'] >= a['rms_mean']).all()
