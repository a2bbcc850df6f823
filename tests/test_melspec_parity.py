"""Log-mel frontend parity vs the reference mel_features (pure numpy)."""
import sys

import numpy as np
import pytest

from fvt_tpu.preprocess import melspec as M


def _import_ref_mel():
    base = '/root/reference/abaw5_pre_processing'
    if base not in sys.path:
        sys.path.insert(0, base)
    from base.vggish import mel_features
    return mel_features


def test_log_mel_spectrogram_parity():
    ref = _import_ref_mel()
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(16000 * 3,)).astype(np.float64) * 0.1

    want = ref.log_mel_spectrogram(
        wav, audio_sample_rate=16000, log_offset=0.01,
        window_length_secs=0.025, hop_length_secs=0.010,
        num_mel_bins=64, lower_edge_hertz=125, upper_edge_hertz=7500)
    got = M.log_mel_spectrogram(wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mel_matrix_parity():
    ref = _import_ref_mel()
    want = ref.spectrogram_to_mel_matrix(
        num_mel_bins=64, num_spectrogram_bins=257,
        audio_sample_rate=16000, lower_edge_hertz=125,
        upper_edge_hertz=7500)
    got = M.spectrogram_to_mel_matrix(
        num_mel_bins=64, num_spectrogram_bins=257,
        audio_sample_rate=16000, lower_edge_hertz=125,
        upper_edge_hertz=7500)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_fractional_example_framing_parity():
    """my_frame with fractional hop (one patch per video frame)."""
    ref = _import_ref_mel()
    rng = np.random.default_rng(1)
    log_mel = rng.normal(size=(1000, 64))
    fps = 29.97
    hop = (1.0 / fps) * 100.0  # frames of 10ms

    want = ref.my_frame(log_mel, window_length=96, hop_length=hop)
    got = M.frame_examples_fractional(log_mel, 96, hop)
    np.testing.assert_allclose(got, want, atol=0)


def test_waveform_to_examples_shape():
    rng = np.random.default_rng(2)
    wav = rng.normal(size=(16000 * 2,)) * 0.05
    out = M.waveform_to_examples(wav, 16000, window_sec=0.96,
                                 hop_sec=1 / 25.0)
    assert out.shape[1:] == (96, 64)
    assert out.shape[0] > 0


def test_resample_and_wav_roundtrip(tmp_path):
    import wave
    rng = np.random.default_rng(3)
    sr = 44100
    wav = (rng.normal(size=(sr,)) * 8000).astype(np.int16)
    p = str(tmp_path / 'x.wav')
    with wave.open(p, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(wav.tobytes())
    data, sr2 = M.read_wav(p)
    assert sr2 == sr and data.shape == wav.shape
    res = M.resample(data / 32768.0, sr, 16000)
    assert abs(len(res) - 16000) <= 2


def _import_ref_vggish_input():
    import types
    base = '/root/reference/abaw5_pre_processing'
    if base not in sys.path:
        sys.path.insert(0, base)
    for name, attrs in (('resampy', {'resample': None}),
                        ('soundfile', {'read': None})):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    from base.vggish import vggish_input
    return vggish_input


def test_waveform_patches_parity_including_edge_pad():
    """End-to-end patch parity vs the reference's vggish_input, INCLUDING
    its one-second edge pad before framing (vggish_input.py:97) — the
    repo path applies the same pad in wavfile_to_examples."""
    ref = _import_ref_vggish_input()
    rng = np.random.default_rng(0)
    sr = 16000
    wav = (rng.normal(size=int(2.3 * sr)) * 0.1).astype(np.float64)
    padded = np.pad(wav, (0, sr), 'edge')

    want = np.asarray(ref.waveform_to_examples(
        padded, sr, window_sec=0.96, hop_sec=1.0 / 25))
    got = M.waveform_to_examples(padded, sr, window_sec=0.96,
                                 hop_sec=1.0 / 25)
    assert got.shape == want.shape
    # fp32 jitted STFT vs the reference's float64 numpy: noise-level only
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_wavfile_to_examples_applies_edge_pad(tmp_path):
    """A clip shorter than one 0.96 s window still yields patches (the
    reference's 1 s edge pad guarantees it); without the pad it would
    produce zero patches and downstream IndexErrors."""
    import wave as wavemod
    sr = 16000
    rng = np.random.default_rng(1)
    data = (rng.normal(size=int(0.5 * sr)) * 3000).astype(np.int16)
    p = str(tmp_path / 'short.wav')
    with wavemod.open(p, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())

    out = M.wavfile_to_examples(p, window_sec=0.96, hop_sec=1.0 / 25)
    assert out.ndim == 3 and out.shape[0] >= 1
    # and the padded region is edge-repeated audio, so patches are finite
    assert np.isfinite(out).all()


def test_vggish_embeddings_reproduce_reference_row_shift(monkeypatch):
    """The reference store LOSES the first VGGish patch: np.savetxt
    writes no header (base/audio.py:148) and compact_audio_feature reads
    the csv with pandas header='infer' (base/preprocessing.py:1003-1005),
    consuming row 0 as column names.  The repo reproduces the shift so
    repo- and reference-extracted vggish.npy agree row-for-row."""
    from fvt_tpu.preprocess import audio as A

    patches = np.arange(6, dtype=np.float32)[:, None, None] * np.ones(
        (6, 96, 64), np.float32)
    monkeypatch.setattr(M, 'wavfile_to_examples',
                        lambda *a, **k: patches)

    class FakeModel:
        def apply(self, variables, x, train=False):
            import jax.numpy as jnp
            return x[:, 0, 0][:, None] * jnp.ones((1, 128), jnp.float32)

    import fvt_tpu.models.vggish as V
    monkeypatch.setattr(V, 'VGGish', lambda *a, **k: FakeModel())

    ann = np.asarray([0, 1, 2, 3])
    emb = A.extract_vggish_embeddings('x.wav', params={}, window_sec=0.96,
                                      hop_sec=0.04, annotated_idx=ann)
    # row i must hold patch i+1 (patch values are their index)
    np.testing.assert_allclose(emb[:, 0], [1.0, 2.0, 3.0, 4.0])
