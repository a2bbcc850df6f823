"""Fused whole-BottleneckIR Pallas block vs the flax module (eval)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fvt_tpu.models.arcface import BottleneckIR
from fvt_tpu.ops.bottleneck_pallas import bottleneck_ir_fused, bn_affine


@pytest.mark.parametrize('hw,c,n', [(12, 64, 6), (8, 128, 4)])
def test_fused_block_matches_flax_eval(hw, c, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, hw, hw, c)).astype(np.float32))

    block = BottleneckIR(in_channel=c, depth=c, stride=1)
    variables = block.init(jax.random.key(0), x, train=False)
    # non-trivial BN statistics (init gives mean 0 / var 1)
    stats = {
        'bn1': {'mean': jnp.asarray(rng.normal(size=(c,)) * 0.1,
                                    jnp.float32),
                'var': jnp.asarray(rng.uniform(0.5, 2.0, size=(c,)),
                                   jnp.float32)},
        'bn2': {'mean': jnp.asarray(rng.normal(size=(c,)) * 0.1,
                                    jnp.float32),
                'var': jnp.asarray(rng.uniform(0.5, 2.0, size=(c,)),
                                   jnp.float32)},
    }
    variables = {'params': variables['params'], 'batch_stats': stats}

    want = np.asarray(block.apply(variables, x, train=False))
    got = np.asarray(bottleneck_ir_fused(
        x, variables['params'], variables['batch_stats'], batch_tile=4))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_block_bf16_close():
    rng = np.random.default_rng(1)
    n, hw, c = 4, 10, 64
    x32 = jnp.asarray(rng.normal(size=(n, hw, hw, c)).astype(np.float32))

    block = BottleneckIR(in_channel=c, depth=c, stride=1,
                         dtype=jnp.bfloat16)
    variables = block.init(jax.random.key(0), x32, train=False)
    want = np.asarray(block.apply(variables, x32.astype(jnp.bfloat16),
                                  train=False), dtype=np.float32)
    got = np.asarray(bottleneck_ir_fused(
        x32.astype(jnp.bfloat16), variables['params'],
        variables['batch_stats'], batch_tile=4), dtype=np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.03


def test_safe_batch_tile_matches_measured_boundary():
    """The clamp reproduces the v5e-measured Mosaic-stack pass/OOM
    boundary points from the module docstring."""
    from fvt_tpu.ops.bottleneck_pallas import safe_batch_tile
    # validated-pass configs survive unclamped (bf16 itemsize 2)
    assert safe_batch_tile(2400, 40, 40, 64, 2, 2) == 2
    assert safe_batch_tile(2400, 20, 20, 128, 2, 8) == 8
    # validated-OOM configs are clamped below the requested tile
    assert safe_batch_tile(2400, 40, 40, 64, 2, 4) < 4
    assert safe_batch_tile(2400, 20, 20, 128, 2, 16) < 16
    # stages where EVERY probed tile OOMed have no validated envelope:
    # the clamp returns 0 (XLA chain) instead of extrapolating
    assert safe_batch_tile(2400, 10, 10, 256, 2, 16) == 0
    assert safe_batch_tile(2400, 5, 5, 512, 2, 32) == 0
    # off-sweep geometry: no measured point -> 0, never a guess
    assert safe_batch_tile(6, 12, 12, 64, 4, 4) == 0
    # result always divides n (validated stage, awkward n)
    t = safe_batch_tile(6, 20, 20, 128, 4, 4)
    assert t and 6 % t == 0


def test_fused_block_xla_fallback_matches_flax():
    """c=512 has no VMEM-safe tile: bottleneck_ir_fused must run the
    plain-XLA fallback (no pallas_call) even with interpret=False."""
    rng = np.random.default_rng(3)
    n, hw, c = 2, 4, 512
    x = jnp.asarray(rng.normal(size=(n, hw, hw, c)).astype(np.float32))
    block = BottleneckIR(in_channel=c, depth=c, stride=1)
    variables = block.init(jax.random.key(0), x, train=False)
    want = np.asarray(block.apply(variables, x, train=False))
    # interpret=False on CPU would crash inside pallas_call; reaching
    # numerical parity proves the fallback branch was taken
    got = np.asarray(bottleneck_ir_fused(
        x, variables['params'], variables['batch_stats'],
        batch_tile=32, interpret=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bn_affine_matches_batchnorm_eval():
    import flax.linen as nn
    rng = np.random.default_rng(2)
    c = 32
    x = jnp.asarray(rng.normal(size=(5, c)).astype(np.float32))
    bn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    params = {'scale': jnp.asarray(rng.uniform(0.5, 2, (c,)), jnp.float32),
              'bias': jnp.asarray(rng.normal(size=(c,)), jnp.float32)}
    stats = {'mean': jnp.asarray(rng.normal(size=(c,)), jnp.float32),
             'var': jnp.asarray(rng.uniform(0.5, 2, (c,)), jnp.float32)}
    want = np.asarray(bn.apply(
        {'params': params, 'batch_stats': stats}, x))
    a, b = bn_affine(params, stats)
    np.testing.assert_allclose(np.asarray(x * a + b), want, rtol=1e-6,
                               atol=1e-6)
