"""Log-mel spectrogram frontend (VGGish flavor), JAX-native.

Port of /root/reference/abaw5_pre_processing/base/vggish/mel_features.py:21-236
and vggish_input.py:38-83 with bit-matched semantics:

  * periodic Hann window, rfft magnitude STFT (25 ms / 10 ms @ 16 kHz,
    fft = next pow2 = 512);
  * HTK mel filterbank 64 bins over 125-7500 Hz, DC bin zeroed;
  * log(mel + 0.01);
  * example framing with FRACTIONAL hop (hop = 1/fps * 100 frames, start
    offsets rounded per example — ``my_frame`` semantics) so one 96x64
    patch lands per video frame.

The STFT+mel runs as a single jit (matmul onto the MXU); framing index
math stays in numpy (it is pure indexing).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

# vggish_params.py:21-34
SAMPLE_RATE = 16000
STFT_WINDOW_LENGTH_SECONDS = 0.025
STFT_HOP_LENGTH_SECONDS = 0.010
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125
MEL_MAX_HZ = 7500
LOG_OFFSET = 0.01
EXAMPLE_WINDOW_SECONDS = 0.96

_MEL_BREAK_FREQUENCY_HERTZ = 700.0
_MEL_HIGH_FREQUENCY_Q = 1127.0


def hertz_to_mel(frequencies_hertz):
    return _MEL_HIGH_FREQUENCY_Q * np.log(
        1.0 + (frequencies_hertz / _MEL_BREAK_FREQUENCY_HERTZ))


def periodic_hann(window_length: int) -> np.ndarray:
    return 0.5 - (0.5 * np.cos(2 * np.pi / window_length
                               * np.arange(window_length)))


def spectrogram_to_mel_matrix(num_mel_bins=20, num_spectrogram_bins=129,
                              audio_sample_rate=8000,
                              lower_edge_hertz=125.0,
                              upper_edge_hertz=3800.0) -> np.ndarray:
    """(num_spectrogram_bins, num_mel_bins) HTK triangular filterbank."""
    nyquist = audio_sample_rate / 2.0
    assert 0.0 <= lower_edge_hertz < upper_edge_hertz <= nyquist
    bins_hz = np.linspace(0.0, nyquist, num_spectrogram_bins)
    bins_mel = hertz_to_mel(bins_hz)
    edges_mel = np.linspace(hertz_to_mel(lower_edge_hertz),
                            hertz_to_mel(upper_edge_hertz),
                            num_mel_bins + 2)
    lower = edges_mel[:-2][None, :]
    center = edges_mel[1:-1][None, :]
    upper = edges_mel[2:][None, :]
    lower_slope = (bins_mel[:, None] - lower) / (center - lower)
    upper_slope = (upper - bins_mel[:, None]) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    weights[0, :] = 0.0  # exclude DC
    return weights


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _stft_mel_log(frames: jnp.ndarray, fft_length: int, window_length: int,
                  num_mel_bins: int, log_offset: float, window: jnp.ndarray,
                  mel_matrix: jnp.ndarray) -> jnp.ndarray:
    windowed = frames * window
    mag = jnp.abs(jnp.fft.rfft(windowed, fft_length))
    mel = mag @ mel_matrix
    return jnp.log(mel + log_offset)


def log_mel_spectrogram(data: np.ndarray,
                        audio_sample_rate: int = SAMPLE_RATE,
                        log_offset: float = LOG_OFFSET,
                        window_length_secs: float
                        = STFT_WINDOW_LENGTH_SECONDS,
                        hop_length_secs: float = STFT_HOP_LENGTH_SECONDS,
                        num_mel_bins: int = NUM_MEL_BINS,
                        lower_edge_hertz: float = MEL_MIN_HZ,
                        upper_edge_hertz: float = MEL_MAX_HZ) -> np.ndarray:
    """1-D waveform -> (num_frames, num_mel_bins) log-mel, reference-exact."""
    window_length = int(round(audio_sample_rate * window_length_secs))
    hop_length = int(round(audio_sample_rate * hop_length_secs))
    fft_length = 2 ** int(np.ceil(np.log(window_length) / np.log(2.0)))

    num_samples = len(data)
    num_frames = 1 + int(np.floor((num_samples - window_length) / hop_length))
    if num_frames <= 0:
        return np.zeros((0, num_mel_bins), dtype=np.float64)
    idx = (np.arange(num_frames)[:, None] * hop_length
           + np.arange(window_length)[None, :])
    frames = np.asarray(data, dtype=np.float64)[idx]

    # pad the frame count to a bucket: every clip has a unique
    # num_frames, and jit would otherwise trace+compile a fresh STFT
    # program per clip (20-120 s per shape over the axon tunnel). The
    # op chain is row-independent (window, rfft, matmul, log), so the
    # zero rows are computed and discarded — bit-identical real rows.
    bucket = 512
    padded_frames = ((num_frames + bucket - 1) // bucket) * bucket
    if padded_frames != num_frames:
        frames = np.concatenate(
            [frames, np.zeros((padded_frames - num_frames, window_length),
                              frames.dtype)], axis=0)

    window = periodic_hann(window_length)
    mel_matrix = spectrogram_to_mel_matrix(
        num_mel_bins=num_mel_bins,
        num_spectrogram_bins=fft_length // 2 + 1,
        audio_sample_rate=audio_sample_rate,
        lower_edge_hertz=lower_edge_hertz,
        upper_edge_hertz=upper_edge_hertz)

    out = _stft_mel_log(jnp.asarray(frames), fft_length, window_length,
                        num_mel_bins, float(log_offset),
                        jnp.asarray(window), jnp.asarray(mel_matrix))
    return np.asarray(out)[:num_frames]


def frame_examples_fractional(log_mel: np.ndarray, window_length: int,
                              hop_length: float) -> np.ndarray:
    """``my_frame`` semantics (mel_features.py:21-49): per-example start =
    round(hop * i); incomplete tail examples dropped."""
    num_samples = log_mel.shape[0]
    num_frames = 1 + int(np.floor((num_samples - window_length) / hop_length))
    out = []
    for i in range(num_frames):
        start = round(hop_length * i)
        out.append(log_mel[start:start + window_length])
    return np.stack(out) if out else np.zeros(
        (0, window_length) + log_mel.shape[1:], log_mel.dtype)


def waveform_to_examples(data: np.ndarray, sample_rate: int,
                         window_sec: float, hop_sec: float) -> np.ndarray:
    """(num_examples, 96, 64) VGGish input patches
    (vggish_input.py:38-83).  hop_sec is typically 1/fps."""
    if data.ndim > 1:
        data = np.mean(data, axis=1)
    if sample_rate != SAMPLE_RATE:
        data = resample(data, sample_rate, SAMPLE_RATE)

    log_mel = log_mel_spectrogram(data)

    features_sample_rate = 1.0 / STFT_HOP_LENGTH_SECONDS
    example_window_length = int(round(window_sec * features_sample_rate))
    example_hop_length = hop_sec * features_sample_rate  # fractional!
    return frame_examples_fractional(log_mel, example_window_length,
                                     example_hop_length)


def resample(data: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (replaces resampy, which is not in the image)."""
    from scipy.signal import resample_poly
    g = math.gcd(sr_in, sr_out)
    return resample_poly(data, sr_out // g, sr_in // g)


def read_wav(path: str):
    """16-bit PCM WAV reader via stdlib (replaces soundfile)."""
    import wave
    with wave.open(path, 'rb') as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    assert width == 2, f'expected 16-bit PCM, got width={width}'
    data = np.frombuffer(raw, dtype=np.int16)
    if ch > 1:
        data = data.reshape(-1, ch)
    return data, sr


def wavfile_to_examples(wav_file: str, window_sec: float, hop_sec: float
                        ) -> np.ndarray:
    data, sr = read_wav(wav_file)
    samples = data / 32768.0
    # the reference edge-pads ONE SECOND of samples before framing
    # (vggish_input.py:97) — without it the tail patches diverge and a
    # clip shorter than the window yields zero patches.  A truly empty
    # wav cannot be edge-padded (np.pad 'edge' on an empty axis raises);
    # pad it with silence instead so the zero-patch degradation path in
    # audio._pad_to_annotated is reachable rather than a ValueError.
    pad = ((0, sr),) + ((0, 0),) * (samples.ndim - 1)
    mode = 'edge' if samples.shape[0] else 'constant'
    samples = np.pad(samples, pad, mode)
    return waveform_to_examples(samples, sr, window_sec, hop_sec)
