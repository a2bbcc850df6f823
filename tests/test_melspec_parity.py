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
