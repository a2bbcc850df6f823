"""Winograd F(2x2,3x3) conv parity vs direct XLA convolution.

The backbone's stride-1 3x3 convs (the hot op, reference
models/arcface_model.py:147-151) may run through ops/winograd.py in the
serving path; these tests pin fp32 parity at every backbone stage shape
(including the odd 5x5 stage that needs tile padding).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvt_tpu.ops.winograd import (conv3x3_winograd, conv3x3_winograd_pallas,
                                  transform_weights)

STAGE_SHAPES = [
    # (N, H, W, Cin, Cout) — the four ArcFace body stages + channel lifts
    (4, 40, 40, 64, 64),
    (4, 20, 20, 128, 128),
    (4, 10, 10, 256, 256),
    (4, 5, 5, 512, 512),
    (4, 10, 10, 128, 256),
    (3, 7, 9, 32, 16),      # odd spatial, ragged batch
]


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(np.float32))


@pytest.mark.parametrize('shape', STAGE_SHAPES)
def test_winograd_xla_matches_direct_fp32(shape):
    n, h, w, ci, co = shape
    x = _rand((n, h, w, ci), 0)
    k = _rand((3, 3, ci, co), 1) * 0.1
    ref = _direct(x, k)
    out = conv3x3_winograd(x, k)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('shape', STAGE_SHAPES)
def test_winograd_pallas_matches_direct_fp32(shape):
    n, h, w, ci, co = shape
    x = _rand((n, h, w, ci), 2)
    k = _rand((3, 3, ci, co), 3) * 0.1
    ref = _direct(x, k)
    out = conv3x3_winograd_pallas(x, k)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_weight_transform_is_exact():
    # identity kernel: conv == copy; transformed weights applied to a
    # constant tile must reproduce it
    k = jnp.zeros((3, 3, 8, 8), jnp.float32)
    k = k.at[1, 1].set(jnp.eye(8))
    x = _rand((2, 8, 8, 8), 4)
    out = conv3x3_winograd(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               rtol=1e-6, atol=1e-6)
    u = transform_weights(k)
    assert u.shape == (4, 4, 8, 8)


def test_winograd_bf16_close_to_fp32_direct():
    x = _rand((2, 10, 10, 128), 5)
    k = _rand((3, 3, 128, 128), 6) * 0.05
    ref = np.asarray(_direct(x, k))
    out = np.asarray(conv3x3_winograd(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16))).astype(np.float32)
    # bf16-noise tolerance: relative error bounded by mantissa width
    err = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    assert np.median(err) < 2e-2, np.median(err)
