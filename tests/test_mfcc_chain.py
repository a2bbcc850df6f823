"""Pins for the native openSMILE HTK-MFCC chain (preprocess/mfcc.py).

The opensmile package is absent in this image, so these tests pin the
chain's analytically-known outputs for the exact options the reference's
conf file selects (abaw5_pre_processing/load/opensmile_mfcc.conf):
silence maps to exactly zero, framing counts, the HTK DCT/lifter closed
forms, HTK output order, the delta edge-replication rule, and filterbank
structure.
"""
import numpy as np
import pytest

from fvt_tpu.preprocess import mfcc as MF


def test_silence_is_exactly_zero():
    # mel floor 1.0 -> log 0 -> every cepstrum 0 -> deltas 0.  This pins
    # the HTK MELFLOOR semantics end-to-end; any floor!=1 or log-offset
    # formulation breaks it.
    out = MF.mfcc(np.zeros(16000), sample_rate=16000)
    assert out.shape[1] == 39
    assert out.shape[0] > 0
    np.testing.assert_array_equal(out, 0.0)


def test_framer_complete_frames_only():
    sr = 16000
    size = int(round(0.025 * sr))       # 400
    step = int(round(0.010 * sr))       # 160
    for n in [399, 400, 401, 400 + 159, 400 + 160, 16000]:
        out = MF.mfcc(np.random.default_rng(0).normal(size=n) * 0.1,
                      sample_rate=sr)
        expect = (n - size) // step + 1 if n >= size else 0
        assert out.shape[0] == expect, n


def test_fractional_hop_uses_integer_step():
    # openSMILE's cFramer steps by round(hop*sr) samples; 1/30 s at 16k
    # rounds to 533.  90 frames need 400 + 89*533 samples.
    sr, hop = 16000, 1.0 / 30.0
    step = int(round(hop * sr))
    assert step == 533
    n = 400 + 89 * step
    out = MF.mfcc(np.random.default_rng(1).normal(size=n) * 0.1,
                  sample_rate=sr, hop_sec=hop)
    assert out.shape[0] == 90


def test_preemphasis_htk_per_frame():
    frames = np.array([[1.0, 2.0, 3.0, 4.0]])
    out = MF._preemphasis_htk(frames, k=0.97)
    np.testing.assert_allclose(
        out[0], [1.0 * 0.03, 2 - 0.97 * 1, 3 - 0.97 * 2, 4 - 0.97 * 3])
    # in-frame only: first sample never sees the previous frame
    two = MF._preemphasis_htk(np.array([[1., 2.], [5., 6.]]))
    np.testing.assert_allclose(two[1], [5 * 0.03, 6 - 0.97 * 5])


def test_dct_htk_closed_form():
    rng = np.random.default_rng(2)
    m = rng.normal(size=(3, 26))
    cep = MF._dct_htk(m)
    # HTK book: c_i = sqrt(2/N) sum_j m_j cos(pi*i/N*(j+0.5)); the SAME
    # scale applies to c0 (unlike scipy's norm='ortho').
    for i in range(13):
        ref = np.sqrt(2.0 / 26) * (
            m * np.cos(np.pi * i * (np.arange(26) + 0.5) / 26)).sum(1)
        np.testing.assert_allclose(cep[:, i], ref, rtol=1e-12)
    assert not np.allclose(
        cep[:, 0], np.sqrt(1.0 / 26) * m.sum(1))  # no ortho c0


def test_lifter_closed_form_and_c0_unliftered():
    cep = np.ones((1, 13))
    out = MF._lifter(cep)
    i = np.arange(13)
    np.testing.assert_allclose(out[0], 1 + 11 * np.sin(np.pi * i / 22))
    assert out[0, 0] == 1.0  # sin(0)=0: c0 passes through


def test_htk_output_order_c0_last():
    # loud white noise: every mel band well above floor -> c0 = the sum
    # of all log energies dominates every other static coefficient.
    rng = np.random.default_rng(3)
    out = MF.mfcc(rng.normal(size=16000) * 0.3, sample_rate=16000)
    static = out[:, :13]
    assert (np.abs(static[:, 12]) >= np.abs(static[:, :12]).max(1)).all()


def test_mel_filterbank_structure():
    fb = MF._mel_filterbank(512, 16000)
    assert fb.shape == (257, 26)
    assert fb.min() >= 0.0 and fb.max() <= 1.0
    # HTK triangles linear in mel: between the first and last filter
    # CENTERS the up/down slopes of adjacent filters sum to 1.
    bins_mel = MF._hz_to_mel(np.arange(257) * (16000 / 512))
    bounds = np.linspace(MF._hz_to_mel(0.0), MF._hz_to_mel(8000.0), 28)
    interior = (bins_mel > bounds[1]) & (bins_mel < bounds[-2])
    np.testing.assert_allclose(fb[interior].sum(1), 1.0, atol=1e-9)
    # each filter peaks (weight ~1) somewhere
    assert (fb.max(0) > 0.5).all()


def test_tone_hits_the_right_mel_band():
    sr = 16000
    f0 = 1000.0
    t = np.arange(sr) / sr
    wav = 0.2 * np.sin(2 * np.pi * f0 * t)
    size, n_fft = 400, 512
    frames = MF._preemphasis_htk(MF._frame_signal(wav, size, 160))
    win = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(size) / (size - 1))
    mag = np.abs(np.fft.rfft(frames * win, n=n_fft, axis=1))
    mel = (mag * MF.SAMPLE_SCALE) ** 2 @ MF._mel_filterbank(n_fft, sr)
    centers_mel = np.linspace(MF._hz_to_mel(0), MF._hz_to_mel(8000),
                              28)[1:-1]
    want = np.argmin(np.abs(centers_mel - MF._hz_to_mel(f0)))
    got = np.bincount(mel.argmax(1), minlength=26).argmax()
    assert abs(int(got) - int(want)) <= 1


def test_delta_regression_and_edges():
    # interior of a ramp: d = sum i*(x[t+i]-x[t-i])/10 = (1*2+2*4)/10 = 1
    x = np.arange(10, dtype=np.float64)[:, None]
    d = MF._delta(x)
    np.testing.assert_allclose(d[2:-2, 0], 1.0)
    # edges replicate: t=0 -> (1*(x1-x0) + 2*(x2-x0))/10 = (1+4)/10
    np.testing.assert_allclose(d[0, 0], 0.5)
    np.testing.assert_allclose(d[1, 0], (1 * 2 + 2 * 3) / 10)
    np.testing.assert_allclose(d[-1, 0], 0.5)


def test_extract_hop_and_annotated_contract(tmp_path):
    import wave
    rng = np.random.default_rng(5)
    sr = 16000
    wav = (rng.normal(size=(sr * 2,)) * 6000).astype(np.int16)
    p = str(tmp_path / 'm.wav')
    with wave.open(p, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(wav.tobytes())
    out = str(tmp_path / 'mfcc.npy')
    # video-rate hop like the reference driver (1/target_fps)
    MF.extract_mfcc(p, out, annotated_idx=np.arange(40),
                    hop_sec=1.0 / 25.0)
    got = np.load(out)
    assert got.shape == (40, 39)
    assert np.isfinite(got).all()


def test_scale_constant_only_moves_c0():
    # multiplying the signal by s shifts log mel by ln(s^2) uniformly
    # (away from the floor), which the DCT maps to c0 alone.
    rng = np.random.default_rng(7)
    wav = rng.normal(size=16000) * 0.2
    a = MF.mfcc(wav)
    b = MF.mfcc(wav * 2.0)
    np.testing.assert_allclose(a[:, :12], b[:, :12], atol=1e-4)
    # c0 = sqrt(2/26) * sum_j log_m_j -> shift = ln(2^2) * sqrt(2/26) * 26
    expect = np.log(4.0) * np.sqrt(2.0 / 26) * 26
    np.testing.assert_allclose(b[:, 12] - a[:, 12],
                               expect, rtol=1e-3)


def test_mfcc_modality_trains(tmp_path):
    """'mfcc' (39-d HTK chain, reference configs.py TCN settings 'mfcc')
    drives a CAN epoch + inference as a first-class modality."""
    import os
    import sys
    from os.path import join
    from types import SimpleNamespace

    sys.path.insert(0, os.path.dirname(__file__))
    from synth_store import make_meld_store
    from fvt_tpu import constants
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment

    root = str(tmp_path / 'mfccstore')
    store = make_meld_store(root, n_train=6, n_val=3, n_test=3,
                            min_len=6, max_len=12)
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(7, 39)) * 3.0
    feat_dir = join(root, 'features', 'compacted_48')
    for split_dir in sorted(os.listdir(feat_dir)):
        for v in sorted(os.listdir(join(feat_dir, split_dir))):
            tdir = join(feat_dir, split_dir, v)
            lab_arr = np.load(join(tdir, 'EXPR_continuous_label.npy'))
            lab, n = int(lab_arr[0]), len(lab_arr)
            np.save(join(tdir, 'mfcc.npy'),
                    (centers[lab] + rng.normal(size=(n, 39))
                     ).astype(np.float32))

    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               model_name=constants.CAN,
               modality='mfcc+bert+EXPR_continuous_label',
               window_length=16, hop_length=8,
               train_batch_size=4, eval_bucket_quantum=8,
               num_workers=1, calc_mean_std=True, seed=0,
               outd=str(tmp_path / 'mfcc_out'))
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
