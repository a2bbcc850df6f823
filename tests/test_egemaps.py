"""Native eGeMAPSv02 (preprocess/egemaps.py): column contract +
analytic-signal behavior.

The openSMILE package is absent in this image, so numerics cannot be
compared against the binary (documented in the module docstring); these
tests pin what IS analytically known: the 88-column contract
(/root/reference/base/audio.py:99-117 consumers expect opensmile's
eGeMAPSv02 Functionals layout, EGEMAPS_DIM=88 in
abaw5_pre_processing/project/abaw5/configs.py:24), pitch/voicing on
pure tones, jitter/shimmer separations, slope signs on sweeps, and the
no-NaN guarantee on degenerate inputs.
"""
import wave

import numpy as np
import pytest

from fvt_tpu.preprocess import egemaps as EG

SR = 16000


def tone(freq=220.0, dur=2.0, amp=0.3, sr=SR):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def col(vec, name):
    return float(vec[EG.COLUMNS.index(name)])


# ------------------------------------------------------------- contract
def test_column_contract():
    assert len(EG.COLUMNS) == 88
    assert len(set(EG.COLUMNS)) == 88
    # opensmile's csv order, spot-pinned at block boundaries
    assert EG.COLUMNS[0] == 'F0semitoneFrom27.5Hz_sma3nz_amean'
    assert EG.COLUMNS[9] == 'F0semitoneFrom27.5Hz_sma3nz_stddevFallingSlope'
    assert EG.COLUMNS[10] == 'loudness_sma3_amean'
    assert EG.COLUMNS[20] == 'spectralFlux_sma3_amean'
    assert EG.COLUMNS[22] == 'mfcc1_sma3_amean'
    assert EG.COLUMNS[30] == 'jitterLocal_sma3nz_amean'
    assert EG.COLUMNS[34] == 'HNRdBACF_sma3nz_amean'
    assert EG.COLUMNS[40] == 'F1frequency_sma3nz_amean'
    assert EG.COLUMNS[58] == 'alphaRatioV_sma3nz_amean'
    assert EG.COLUMNS[76] == 'alphaRatioUV_sma3nz_amean'
    assert EG.COLUMNS[81] == 'loudnessPeaksPerSec'
    assert EG.COLUMNS[87] == 'equivalentSoundLevel_dBp'


# ----------------------------------------------------------- pure tone
@pytest.fixture(scope='module')
def tone_vec():
    return EG.egemaps_functionals(tone(), SR)


def test_tone_pitch(tone_vec):
    # 220 Hz = 12*log2(220/27.5) = exactly 36 semitones above 27.5 Hz
    assert abs(col(tone_vec, 'F0semitoneFrom27.5Hz_sma3nz_amean')
               - 36.0) < 0.5
    # steady pitch: tiny normalized deviation, ordered percentiles
    assert col(tone_vec, 'F0semitoneFrom27.5Hz_sma3nz_stddevNorm') < 0.02
    p20 = col(tone_vec, 'F0semitoneFrom27.5Hz_sma3nz_percentile20.0')
    p50 = col(tone_vec, 'F0semitoneFrom27.5Hz_sma3nz_percentile50.0')
    p80 = col(tone_vec, 'F0semitoneFrom27.5Hz_sma3nz_percentile80.0')
    assert p20 <= p50 <= p80
    assert abs(p50 - 36.0) < 0.5


def test_tone_voicing_quality(tone_vec):
    # one long voiced segment covering the file
    assert col(tone_vec, 'VoicedSegmentsPerSec') < 1.5
    assert col(tone_vec, 'MeanVoicedSegmentLengthSec') > 1.0
    # clean periodicity: low jitter/shimmer, high HNR
    assert col(tone_vec, 'jitterLocal_sma3nz_amean') < 0.03
    assert col(tone_vec, 'shimmerLocaldB_sma3nz_amean') < 1.0
    assert col(tone_vec, 'HNRdBACF_sma3nz_amean') > 10.0


def test_tone_level():
    loud = EG.egemaps_functionals(tone(amp=0.5), SR)
    quiet = EG.egemaps_functionals(tone(amp=0.05), SR)
    # 20 dB amplitude ratio == 20 dB equivalent-level difference
    d = (col(loud, 'equivalentSoundLevel_dBp')
         - col(quiet, 'equivalentSoundLevel_dBp'))
    assert abs(d - 20.0) < 1.0
    assert (col(loud, 'loudness_sma3_amean')
            > col(quiet, 'loudness_sma3_amean'))


def test_shimmer_separates_amplitude_modulation():
    steady = EG.egemaps_functionals(tone(), SR)
    t = np.arange(int(2.0 * SR)) / SR
    am = (0.3 * (1.0 + 0.6 * np.sin(2 * np.pi * 30.0 * t))
          * np.sin(2 * np.pi * 220.0 * t))
    mod = EG.egemaps_functionals(am, SR)
    assert (col(mod, 'shimmerLocaldB_sma3nz_amean')
            > 2.0 * col(steady, 'shimmerLocaldB_sma3nz_amean'))


def test_loudness_peaks_track_slow_am():
    t = np.arange(int(4.0 * SR)) / SR
    am = (0.3 * (1.0 + 0.8 * np.sin(2 * np.pi * 3.0 * t))
          * np.sin(2 * np.pi * 220.0 * t))
    vec = EG.egemaps_functionals(am, SR)
    # 3 Hz envelope -> ~3 loudness peaks per second
    assert 1.5 < col(vec, 'loudnessPeaksPerSec') < 6.0


def test_pitch_sweep_slopes():
    t = np.arange(int(2.0 * SR)) / SR
    # linear 120 -> 240 Hz chirp: phase = 2pi*(120 t + 30 t^2)
    sweep = 0.3 * np.sin(2 * np.pi * (120.0 * t + 30.0 * t * t))
    vec = EG.egemaps_functionals(sweep, SR)
    # one octave over 2 s = +6 semitones/s rising contour
    rise = col(vec, 'F0semitoneFrom27.5Hz_sma3nz_meanRisingSlope')
    assert 2.0 < rise < 20.0
    assert (col(vec, 'F0semitoneFrom27.5Hz_sma3nz_percentile80.0')
            > col(vec, 'F0semitoneFrom27.5Hz_sma3nz_percentile20.0') + 3.0)


# ------------------------------------------------------- degenerate in
def test_noise_mostly_unvoiced_and_finite():
    rng = np.random.default_rng(0)
    vec = EG.egemaps_functionals(0.1 * rng.standard_normal(2 * SR), SR)
    assert np.isfinite(vec).all()
    assert col(vec, 'VoicedSegmentsPerSec') < 5.0
    # broadband spectrum: unvoiced spectral means populated
    assert col(vec, 'spectralFluxUV_sma3nz_amean') >= 0.0


def test_silence_is_finite_zeros():
    vec = EG.egemaps_functionals(np.zeros(SR), SR)
    assert vec.shape == (88,)
    assert np.isfinite(vec).all()
    assert col(vec, 'F0semitoneFrom27.5Hz_sma3nz_amean') == 0.0
    assert col(vec, 'jitterLocal_sma3nz_amean') == 0.0
    assert col(vec, 'equivalentSoundLevel_dBp') < -50.0


def test_short_input_no_crash():
    vec = EG.egemaps_functionals(np.zeros(100), SR)  # < one frame
    assert vec.shape == (88,) and np.isfinite(vec).all()


# ---------------------------------------------------------- per frame
def test_functionals_rows_match_per_window_oracle():
    """The vectorized batch path (masked cumulative sums, strided
    percentiles) must reproduce the per-window oracle row for row,
    including tail-clamped short windows, empty windows and windows
    with no voiced (or no unvoiced) frames."""
    rng = np.random.default_rng(3)
    t = np.arange(4 * SR) / SR
    # voiced tone bursts separated by noise/silence -> mixed voicing
    wav = (0.3 * np.sin(2 * np.pi * 150 * t)
           * (np.sin(2 * np.pi * 0.7 * t) > 0)
           + 0.02 * rng.standard_normal(len(t)))
    lld = EG.egemaps_lld(wav, SR)
    sm = EG.smooth_tracks(lld)
    n = len(sm['voiced'])
    win = 100
    starts = np.array([0, 7, 50, n - win, n - 30, n - 1])
    ends = np.minimum(starts + win, n)
    level = rng.normal(size=len(starts))

    rows = EG.functionals_rows(sm, starts, ends, level)
    for r in range(len(starts)):
        want = EG._functionals_window(sm, int(starts[r]), int(ends[r]),
                                      float(level[r]))
        np.testing.assert_allclose(rows[r], want, rtol=2e-5, atol=2e-5,
                                   err_msg=f"row {r}")


def test_whole_file_equals_single_full_window():
    """egemaps_functionals == the batch path over one full-range window
    (smoothing happens once at the LLD level, so both see identical
    tracks)."""
    wav = tone(dur=1.5)
    vec = EG.egemaps_functionals(wav, SR)
    lld = EG.egemaps_lld(wav, SR)
    sm = EG.smooth_tracks(lld)
    n = len(sm['voiced'])
    level = vec[EG.COLUMNS.index('equivalentSoundLevel_dBp')]
    rows = EG.functionals_rows(sm, np.array([0]), np.array([n]),
                               np.array([level]))
    np.testing.assert_allclose(rows[0], vec, rtol=2e-5, atol=2e-5)


def test_per_frame_rows_shape_and_stationarity():
    wav = tone(dur=3.0)
    rows = EG.egemaps_per_frame(wav, SR, length=10, target_frequency=5.0)
    assert rows.shape == (10, 88)
    assert rows.dtype == np.float32
    assert np.isfinite(rows).all()
    # stationary signal -> every 1 s window sees the same pitch
    i = EG.COLUMNS.index('F0semitoneFrom27.5Hz_sma3nz_amean')
    assert np.ptp(rows[:, i]) < 1.0
    assert abs(rows[0, i] - 36.0) < 0.5


def test_extract_egemaps_per_frame_contract(tmp_path):
    """The driver-facing entry (mfcc.extract_egemaps) with the
    reference's (length, fps) windowing produces (length, 88)."""
    from fvt_tpu.preprocess import mfcc as MF
    wav = (tone(dur=2.0) * 32767).astype(np.int16)
    p = str(tmp_path / 't.wav')
    with wave.open(p, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(wav.tobytes())
    out = str(tmp_path / 'egemaps.npy')
    MF.extract_egemaps(p, out, length=8, target_frequency=4.0)
    feats = np.load(out)
    assert feats.shape == (8, 88)
    assert np.isfinite(feats).all()


# ------------------------------------------------- modality end-to-end
def test_egemaps_modality_trains(tmp_path):
    """'egemaps' is a first-class feature modality (reference
    configs.py:55 feature_dimension egemaps=(88,), models/model.py:390
    input dim 88): a store carrying egemaps.npy per trial drives a CAN
    training epoch + inference through the standard stack."""
    import os
    from os.path import join
    from types import SimpleNamespace

    from fvt_tpu import constants
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment
    from synth_store import make_meld_store

    root = str(tmp_path / 'ege_store')
    store = make_meld_store(root, n_train=6, n_val=3, n_test=3,
                            min_len=6, max_len=12)
    # extend every trial with a separable 88-d egemaps stream
    rng = np.random.default_rng(1)
    centers = rng.normal(size=(7, 88)) * 3.0
    feat_dir = join(root, 'features', 'compacted_48')
    for split_dir in sorted(os.listdir(feat_dir)):
        for v in sorted(os.listdir(join(feat_dir, split_dir))):
            tdir = join(feat_dir, split_dir, v)
            lab = int(np.load(join(
                tdir, 'EXPR_continuous_label.npy'))[0])
            n = len(np.load(join(tdir, 'EXPR_continuous_label.npy')))
            np.save(join(tdir, 'egemaps.npy'),
                    (centers[lab] + rng.normal(size=(n, 88))
                     ).astype(np.float32))

    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               model_name=constants.CAN,
               modality='egemaps+bert+EXPR_continuous_label',
               window_length=16, hop_length=8,
               train_batch_size=4, eval_bucket_quantum=8,
               num_workers=1, calc_mean_std=True, seed=0,
               outd=str(tmp_path / 'ege_out'))
    args = SimpleNamespace(**cfg)

    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    loss = trainer.train_one_epoch(loaders[constants.TRAINSET], 0)
    assert np.isfinite(loss)
    perf, per_video = trainer.inference(loaders[constants.VALIDSET])
    assert len(per_video) == 3
    for v, d in per_video.items():
        assert d['logits'].shape[1] == 7, (v, d['logits'].shape)
