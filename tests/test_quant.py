"""int8 serving quantization (ops/quant.py + --serve_quant plumbing)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fvt_tpu.ops.quant import quantize_symmetric, conv3x3_int8


def _ref_conv(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def test_quantize_symmetric_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))
    q, scale = quantize_symmetric(x)
    assert q.dtype == jnp.int8
    # dequantized error bounded by half a step
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) -
                 np.asarray(x))
    # per-element bound: each value within half of ITS OWN (broadcast)
    # scale step — exact for per-channel scales too
    assert (err <= np.asarray(scale) * 0.5 + 1e-7).all()
    # q(0) == 0: zero padding commutes with quantization
    z, _ = quantize_symmetric(jnp.zeros((2, 2)))
    assert (np.asarray(z) == 0).all()


@pytest.mark.parametrize('stride', [1, 2])
def test_conv3x3_int8_close_to_fp32(stride):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 10, 10, 32)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 32, 48)) * 0.1
                     ).astype(np.float32))
    want = np.asarray(_ref_conv(x, k, stride))
    got = np.asarray(conv3x3_int8(x, k, stride=stride,
                                  out_dtype=jnp.float32))
    assert got.shape == want.shape
    # int8 W8A8: relative error a few percent of the output range
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.03, \
        np.abs(got - want).max() / denom
    # argmax over channels (what classification consumes downstream)
    # agrees almost everywhere
    # (random iid channels make argmax fragile at single-conv level; the
    # end-task criteria live in the embedding-cosine test below and
    # tools/quant_delta.py)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_backbone_int8_embedding_close_to_fp32():
    """Full ArcFace forward, int8 convs vs fp32: cosine similarity of the
    l2-normed embeddings stays high (quality-delta criterion; exact
    numbers recorded by tools/quant_delta.py)."""
    from fvt_tpu.models.arcface import VisualBackbone

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 40, 40, 3)).astype(np.float32))

    fp = VisualBackbone(dtype=jnp.float32, conv_impl='xla')
    variables = jax.jit(lambda r, v: fp.init(r, v, train=False))(
        jax.random.key(0), x)
    e_fp = np.asarray(fp.apply(variables, x, train=False))

    q = VisualBackbone(dtype=jnp.float32, conv_impl='int8')
    e_q = np.asarray(q.apply(variables, x, train=False))

    cos = (e_fp * e_q).sum(-1)  # both l2-normed
    assert cos.min() > 0.97, cos

    # the param tree is IDENTICAL (int8 quantizes in-graph from the same
    # fp32 kernels) so torch-ported / orbax checkpoints load unchanged
    q_vars = jax.jit(lambda r, v: q.init(r, v, train=False))(
        jax.random.key(0), x)
    assert jax.tree_util.tree_structure(q_vars) == \
        jax.tree_util.tree_structure(variables)


def test_conv3x3_int8_static_scale_matches_dynamic():
    """Passing the batch's own amax as the calibrated scale reproduces
    the dynamic path BITWISE (same scale -> same int8 values -> same
    int32 accumulate -> same dequant)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 16, 24)) * 0.1
                     ).astype(np.float32))
    dyn = np.asarray(conv3x3_int8(x, k, out_dtype=jnp.float32))
    amax = float(np.abs(np.asarray(x)).max())
    scale = max(amax, 1e-12) / 127.0
    sta = np.asarray(conv3x3_int8(x, k, out_dtype=jnp.float32,
                                  x_scale=scale))
    np.testing.assert_array_equal(dyn, sta)


def test_backbone_int8_static_calibration_roundtrip():
    """--serve_quant int8_static mechanism at the backbone level:
    a mutable-['act_scales'] apply records one amax per quantized conv
    (the 41 3x3 convs with Cin>=128 in the ir-50 plan); re-applying with
    that collection reproduces the dynamic-int8 output bitwise on the
    calibration batch and stays embedding-close to fp32 on fresh data."""
    from fvt_tpu.models.arcface import VisualBackbone, get_blocks_50

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(3, 40, 40, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(3, 40, 40, 3)).astype(np.float32))

    q = VisualBackbone(dtype=jnp.float32, conv_impl='int8')
    variables = jax.jit(lambda r, v: q.init(r, v, train=False))(
        jax.random.key(0), x)

    e_dyn, mut = q.apply(variables, x, train=False,
                         mutable=['act_scales'])
    scales = mut['act_scales']
    n_expect = sum((in_c >= 128) + (depth >= 128)
                   for in_c, depth, _ in get_blocks_50())
    assert len(jax.tree_util.tree_leaves(scales)) == n_expect == 41

    e_sta = q.apply({**variables, 'act_scales': scales}, x, train=False)
    np.testing.assert_array_equal(np.asarray(e_dyn), np.asarray(e_sta))

    # fresh batch under the frozen calibrated scales: still a valid
    # embedding (fp32-cosine criterion shared with the dynamic test)
    fp = VisualBackbone(dtype=jnp.float32, conv_impl='xla')
    e_fp = np.asarray(fp.apply(variables, x2, train=False))
    e_q2 = np.asarray(q.apply({**variables, 'act_scales': scales}, x2,
                              train=False))
    cos = (e_fp * e_q2).sum(-1)
    assert cos.min() > 0.97, cos


def test_serve_quant_rejected_for_training(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_store import make_meld_store
    from fvt_tpu.config.parse import parse_input

    store = make_meld_store(str(tmp_path / 's'), n_train=2, n_val=1,
                            n_test=1, min_len=4, max_len=6)
    with pytest.raises(AssertionError, match='serve_quant'):
        parse_input([
            '--dataset_name', 'MELD',
            '--dataset_path', store['dataset_path'],
            '--folds_dir', store['folds_dir'],
            '--serve_quant', 'int8',
            '--outd', str(tmp_path / 'exp'),
        ])


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get('FVT_SLOW_QUANT'),
                    reason='~15 min on CPU (emulated int8 ResNet-50 '
                           'convs); opt in with FVT_SLOW_QUANT=1 — '
                           'passes as of r3')
def test_int8_static_full_inference_pipeline(tmp_path):
    """--serve_quant int8_static end-to-end at the TRAINER level: the
    calibrated act_scales must reach BOTH eval paths — the bucketed
    short-video step and the device-windowed (stitch) step, whose jits
    are lazily rebuilt after calibration (trainer.calibrate_quant
    resets _win_step/_dp_eval).  Pins that the quantized pipeline
    stays close to the fp32/xla serving output (argmax agreement) on a
    store that exercises both paths."""
    import sys, os
    from types import SimpleNamespace
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_store import make_meld_store
    from fvt_tpu import constants
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment

    store = make_meld_store(str(tmp_path / 'qstore'), n_train=3, n_val=4,
                            n_test=2, min_len=4, max_len=24,
                            with_video=True)

    def build(serve_quant):
        cfg = get_config('MELD')
        cfg.update(dataset_path=store['dataset_path'],
                   folds_dir=store['folds_dir'],
                   modality='video+vggish+bert+EXPR_continuous_label',
                   window_length=16, hop_length=8, eval_bucket_quantum=8,
                   num_workers=1, calc_mean_std=True, seed=0,
                   serve_quant=serve_quant)
        exp = Experiment(SimpleNamespace(**cfg))
        exp.prepare()
        loaders = exp.init_loaders()
        trainer = exp.init_trainer()
        sample = exp._sample_batch(loaders)
        trainer.init_state(sample)
        return trainer, loaders, sample

    ref_tr, ref_loaders, _ = build('none')
    _, ref_logits = ref_tr.inference(ref_loaders[constants.VALIDSET])

    q_tr, q_loaders, sample = build('int8_static')
    scales = q_tr.calibrate_quant(sample)
    import jax
    assert len(jax.tree.leaves(scales)) > 0

    lens = [item[2] for item in q_loaders[constants.VALIDSET].work_list]
    assert any(l > 16 for l in lens) and any(l <= 16 for l in lens)

    _, q_logits = q_tr.inference(q_loaders[constants.VALIDSET])
    assert set(q_logits) == set(ref_logits)
    agree = total = 0
    for k in ref_logits:
        a = np.argmax(ref_logits[k]['logits'], -1)
        b = np.argmax(q_logits[k]['logits'], -1)
        agree += (a == b).sum()
        total += a.size
    # int8 W8A8 on a random-init backbone: prediction flips stay rare
    assert agree / total > 0.9, (agree, total)
