"""MFCC extraction (39-d @ 100 Hz): 13 cepstra + delta + delta-delta.

The reference extracts MFCC/eGeMAPS with openSMILE (base/audio.py:73-117),
an external binary not present in this image.  This module provides a
native alternative with the same SHAPE contract (MFCC_DIM=39 at the
100 Hz frame rate the training config expects, configs.py:24) built on
the same STFT/mel frontend as the VGGish path.

NUMERICS: the native MFCC is shape-compatible but NOT openSMILE-numerics
(different mel filterbank conventions, lifter, and pre-emphasis); models
trained on one extractor's features are not transferable to the other.
eGeMAPS functionals are supported only WITH openSMILE (see
``extract_egemaps``) — the 88 functionals are defined by its
implementation.  Neither modality is in the reference's default feature
set (vggish/bert/video).
"""
from __future__ import annotations

import numpy as np
import scipy.fft

from fvt_tpu.preprocess import melspec


def _delta(feat: np.ndarray, width: int = 2) -> np.ndarray:
    """HTK-style regression deltas over +-width frames."""
    n = feat.shape[0]
    denom = 2 * sum(i * i for i in range(1, width + 1))
    padded = np.pad(feat, ((width, width), (0, 0)), mode='edge')
    out = np.zeros_like(feat)
    for i in range(1, width + 1):
        out += i * (padded[width + i:width + i + n]
                    - padded[width - i:width - i + n])
    return out / denom


def mfcc(wav: np.ndarray, sample_rate: int = 16000, n_mfcc: int = 13,
         n_mels: int = 26, window_sec: float = 0.025,
         hop_sec: float = 0.010) -> np.ndarray:
    """(num_frames, 39) float32: c0-12 + deltas + delta-deltas."""
    log_mel = melspec.log_mel_spectrogram(
        wav, audio_sample_rate=sample_rate, log_offset=1e-6,
        window_length_secs=window_sec, hop_length_secs=hop_sec,
        num_mel_bins=n_mels, lower_edge_hertz=20.0,
        upper_edge_hertz=sample_rate / 2.0 - 100.0)
    cep = scipy.fft.dct(log_mel, type=2, axis=1, norm='ortho')[:, :n_mfcc]
    d1 = _delta(cep)
    d2 = _delta(d1)
    return np.concatenate([cep, d1, d2], axis=1).astype(np.float32)


def extract_mfcc(wav_path: str, output_path: str,
                 annotated_idx: np.ndarray = None):
    """wav file -> mfcc.npy (resampled to the annotated frame index when
    given, matching the multiplier/frequency contract)."""
    import os
    if os.path.isfile(output_path):
        return
    data, sr = melspec.read_wav(wav_path)
    samples = data / 32768.0
    if samples.ndim > 1:  # stereo wav -> mono, like waveform_to_examples
        samples = np.mean(samples, axis=1)
    feats = mfcc(samples, sample_rate=sr)
    if annotated_idx is not None:
        length = int(max(annotated_idx))
        diff = length - len(feats) + 1
        if diff > 0:
            feats = np.concatenate(
                [feats, np.repeat(feats[-1][None], diff, axis=0)])
        feats = feats[annotated_idx]
    os.makedirs(os.path.dirname(os.path.abspath(output_path)),
                exist_ok=True)
    np.save(output_path, feats)


def extract_egemaps(wav_path: str, output_path: str,
                    length: int = None, target_frequency: float = None,
                    **kwargs):
    """eGeMAPSv02 FUNCTIONALS (88-d), one vector per target frame over a
    1-second sliding window — the reference's exact windowing scheme
    (base/audio.py:99-117: starts = arange(length)/fps, ends = starts+1).

    SUPPORTED ONLY WITH openSMILE: the 88 functionals are defined by the
    openSMILE implementation and have no native numerical equivalent
    here; this path is feature-complete when the package is installed and
    raises a clear gate error otherwise.  The eGeMAPS modality is unused
    by the reference's default feature set (vggish/bert/video)."""
    try:
        import opensmile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            'eGeMAPS extraction needs the opensmile package '
            '(not in this image); MFCC/log-mel/VGGish cover the audio '
            'feature contract natively') from e
    import os
    smile = opensmile.Smile(
        feature_set=opensmile.FeatureSet.eGeMAPSv02,
        feature_level=opensmile.FeatureLevel.Functionals)
    if length is not None and target_frequency is not None:
        starts = np.arange(length) / target_frequency
        ends = starts + 1.0
        feats = smile.process_files(
            files=[wav_path] * int(length), starts=starts,
            ends=ends).values
    else:
        feats = smile.process_file(wav_path).values
    os.makedirs(os.path.dirname(os.path.abspath(output_path)),
                exist_ok=True)
    np.save(output_path, feats.astype(np.float32))
