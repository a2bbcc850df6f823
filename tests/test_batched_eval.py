"""Batched same-bucket eval == bs=1 eval, per video.

Identity is at fp32 reduction-order tolerance (different batch shapes
compile to different XLA programs, so last-ulp differences are expected;
observed max ~5e-7 abs), NOT bitwise.

Locks the throughput optimization of data/loader.py::EvalLoader.batches
(eval_video_batch > 1) to the reference's bs=1 eval semantics
(/root/reference/trainer.py:447-506), including the windowed-singleton
path for videos longer than the model window (stitch inference) mixed
with short bucketed videos.
"""
import numpy as np
import pytest

from types import SimpleNamespace

import jax.numpy as jnp

from fvt_tpu import constants
from fvt_tpu.config.defaults import get_config
from fvt_tpu.experiment import Experiment
from synth_store import make_meld_store


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('bstore'))
    # lengths straddle the model window (16): long videos take the
    # stitch path as singletons, short ones share padded buckets
    store = make_meld_store(root, n_train=4, n_val=10, n_test=4,
                            min_len=6, max_len=40)

    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='vggish+bert+EXPR_continuous_label',
               window_length=16, hop_length=8, eval_bucket_quantum=8,
               num_workers=1, calc_mean_std=True, seed=0)
    args = SimpleNamespace(**cfg)

    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    return args, trainer, loaders


def _logits(trainer, loader, batch_videos):
    trainer.args.eval_video_batch = batch_videos
    _, per_video = trainer.inference(loader)
    return per_video


def test_batched_eval_bit_identical_to_bs1(setup):
    args, trainer, loaders = setup
    val = loaders[constants.VALIDSET]

    # sanity: the synthetic store actually exercises BOTH paths
    lens = [trainer.model and item[2] for item in val.work_list]
    assert any(max(l, args.window_length) > args.window_length
               for l in lens), 'no windowed (stitch) video in the mix'
    assert sum(1 for l in lens
               if max(l, args.window_length) <= args.window_length) >= 2, \
        'no shared bucket batch in the mix'

    a = _logits(trainer, val, batch_videos=1)
    b = _logits(trainer, val, batch_videos=32)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k]['labels'], b[k]['labels'])
        np.testing.assert_allclose(
            a[k]['logits'], b[k]['logits'], rtol=1e-4, atol=1e-5,
            err_msg=f'batched eval diverged on {k}')


def test_batched_eval_mixed_bucket_sizes(setup):
    """An in-between batch size that splits buckets unevenly still
    reproduces bs=1 logits exactly."""
    args, trainer, loaders = setup
    val = loaders[constants.VALIDSET]
    a = _logits(trainer, val, batch_videos=1)
    c = _logits(trainer, val, batch_videos=3)
    for k in a:
        np.testing.assert_allclose(a[k]['logits'], c[k]['logits'],
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('wb', [1, 3, 8])
def test_pooled_window_batches_match_per_video_stitch(setup, wb):
    """The cross-video pooled window pipeline (eval_window_batch) is
    bit-identical per video to the standalone per-video stitch
    (_forward_windows), including odd batch sizes that split one video's
    windows across dispatches and tail batches padded with duplicate
    windows."""
    args, trainer, loaders = setup
    val = loaders[constants.VALIDSET]

    trainer.args.eval_window_batch = wb
    trainer.args.eval_device_windows = False  # exercise the POOLED path
    try:
        _, per_video = trainer.inference(val)
    finally:
        trainer.args.eval_window_batch = 8
        trainer.args.eval_device_windows = True

    checked = 0
    for batch, trials, true_lens, _ in val.batches(
            1, windowed_threshold=args.window_length):
        batch.pop(constants.EXPR)
        if true_lens[0] <= args.window_length:
            continue
        ref = trainer._forward_windows(batch, true_lens[0])
        got = per_video[trials[0]]['logits']
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f'wb={wb} trial={trials[0]}')
        checked += 1
    assert checked >= 2, 'needs >=2 windowed videos to cross batches'


def test_device_windowed_path_matches_per_video_stitch(setup):
    """--eval_device_windows (the default): each long video is uploaded
    once and its windows gathered ON DEVICE; per-video logits must match
    the per-video host-windowed oracle (_forward_windows) exactly up to
    fp reduction order — including the ladder padding rows, which are
    discarded before the stitch."""
    args, trainer, loaders = setup
    val = loaders[constants.VALIDSET]

    assert getattr(trainer.args, 'eval_device_windows', True)
    _, per_video = trainer.inference(val)

    checked = 0
    for batch, trials, true_lens, _ in val.batches(
            1, windowed_threshold=args.window_length):
        batch.pop(constants.EXPR)
        if true_lens[0] <= args.window_length:
            continue
        ref = trainer._forward_windows(batch, true_lens[0])
        got = per_video[trials[0]]['logits']
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f'trial={trials[0]}')
        checked += 1
    assert checked >= 2


def test_device_windowed_equals_pooled_path(setup):
    """Flag on vs flag off: identical per-video logits and labels."""
    args, trainer, loaders = setup
    val = loaders[constants.VALIDSET]

    trainer.args.eval_device_windows = True
    _, a = trainer.inference(val)
    trainer.args.eval_device_windows = False
    try:
        _, b = trainer.inference(val)
    finally:
        trainer.args.eval_device_windows = True
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k]['labels'], b[k]['labels'])
        np.testing.assert_allclose(a[k]['logits'], b[k]['logits'],
                                   rtol=1e-5, atol=1e-6)


def test_inference_artifact_order_is_work_list_order(setup):
    args, trainer, loaders = setup
    val = loaders[constants.VALIDSET]
    _, per_video = trainer.inference(val)
    assert list(per_video) == [item[1] for item in val.work_list]


def test_h2d_bf16_features_close_and_smaller(setup):
    """--h2d_bf16_features ships fp32 feature streams as bf16: logits
    stay within bf16 input-quantization tolerance of the fp32 path and
    the recorded H2D byte count shrinks."""
    args, trainer, loaders = setup
    val = loaders[constants.VALIDSET]

    _, a = trainer.inference(val)
    bytes_fp32 = trainer.last_inference_timing['h2d_bytes']
    trainer.args.h2d_bf16_features = True
    try:
        _, b = trainer.inference(val)
        bytes_bf16 = trainer.last_inference_timing['h2d_bytes']
    finally:
        trainer.args.h2d_bf16_features = False
    assert bytes_bf16 < bytes_fp32
    for k in a:
        ref = a[k]['logits']
        scale = np.abs(ref).max()
        assert np.abs(b[k]['logits'] - ref).max() / scale < 0.02, k


def test_device_windowed_geometric_ladder_matches_oracle(tmp_path):
    """Videos LONGER than 4x the model window land in ladder_len's
    GEOMETRIC region (the module-setup store stops at 2.5x, i.e. the
    linear-quantum region): the live device-window path must still
    equal the per-video oracle with the larger ladder pad discarded."""
    root = str(tmp_path / 'longstore')
    store = make_meld_store(root, n_train=3, n_val=3, n_test=3,
                            min_len=70, max_len=160)
    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='vggish+bert+EXPR_continuous_label',
               window_length=16, hop_length=8, eval_bucket_quantum=8,
               num_workers=1, calc_mean_std=True, seed=0)
    args = SimpleNamespace(**cfg)
    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    val = loaders[constants.VALIDSET]

    from fvt_tpu.data import windowing as W
    assert all(W.ladder_len(item[2], args.window_length) >= item[2]
               and item[2] > 4 * args.window_length
               for item in val.work_list), 'store must hit the geometric region'

    _, per_video = trainer.inference(val)
    checked = 0
    for batch, trials, true_lens, _ in val.batches(
            1, windowed_threshold=args.window_length):
        batch.pop(constants.EXPR)
        ref = trainer._forward_windows(batch, true_lens[0])
        np.testing.assert_allclose(per_video[trials[0]]['logits'], ref,
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f'trial={trials[0]}')
        checked += 1
    assert checked == 3
