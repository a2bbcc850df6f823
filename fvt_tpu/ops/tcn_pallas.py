"""Pallas TPU kernel: fused TCN temporal block (inference path).

One VMEM-resident kernel per (batch row) computes the whole reference
TemporalBlock (temporal_convolutional_model.py:21-54):

    y = leaky( leaky(conv1(x)) -> conv2 -> leaky  + downsample(x) )

Both dilated causal convs are expressed as K shifted (T, Cin) @ (Cin, Cout)
matmuls on the MXU, with the intermediate activation never leaving VMEM —
this removes 3 HBM round-trips per block vs the layer-by-layer XLA path.
Sizes: T<=~600, C<=768 -> all buffers fit the ~16 MB VMEM comfortably.

Dropout is inference-off, so the kernel matches the flax TemporalBlock in
eval mode bit-for-bit (up to matmul precision).  Training uses the XLA
path (autodiff); the kernel backs the high-throughput inference/serving
path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.01


def _leaky(x):
    return jnp.where(x >= 0, x, x * NEG_SLOPE)


def _block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wd_ref, bd_ref,
                  out_ref, *, kernel_size: int, dilation: int,
                  has_downsample: bool):
    """Grid: (B,).  x_ref: (1, pad+T, Cin); out: (1, T, Cout)."""
    pad = (kernel_size - 1) * dilation
    t = out_ref.shape[1]

    x = x_ref[0]  # (pad+T, Cin)

    # conv1: K shifted matmuls; tap k reads rows [k*d, k*d + T) — all
    # offsets are Python-static, so these are static slices
    acc = jnp.zeros((t, w1_ref.shape[2]), dtype=jnp.float32)
    for k in range(kernel_size):
        xs = x[k * dilation:k * dilation + t]
        acc += jnp.dot(xs, w1_ref[k], preferred_element_type=jnp.float32)
    h = _leaky(acc + b1_ref[0])

    # conv2 over h with its own causal left pad (zeros)
    hp = jnp.concatenate(
        [jnp.zeros((pad, h.shape[1]), dtype=h.dtype), h], axis=0)
    acc2 = jnp.zeros((t, w2_ref.shape[2]), dtype=jnp.float32)
    for k in range(kernel_size):
        hs = hp[k * dilation:k * dilation + t]
        acc2 += jnp.dot(hs, w2_ref[k], preferred_element_type=jnp.float32)
    net = _leaky(acc2 + b2_ref[0])

    xt = x[pad:pad + t]  # unpadded input
    if has_downsample:
        res = jnp.dot(xt, wd_ref[0],
                      preferred_element_type=jnp.float32) + bd_ref[0]
    else:
        res = xt
    out_ref[0] = _leaky(net + res).astype(out_ref.dtype)


def fused_temporal_block(x: jnp.ndarray,
                         w1: jnp.ndarray, b1: jnp.ndarray,
                         w2: jnp.ndarray, b2: jnp.ndarray,
                         wd: Optional[jnp.ndarray] = None,
                         bd: Optional[jnp.ndarray] = None,
                         *, kernel_size: int, dilation: int,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """x (B, T, Cin); w1 (K, Cin, Cout); w2 (K, Cout, Cout); optional
    1x1 downsample wd (Cin, Cout), bd (Cout)."""
    b, t, cin = x.shape
    cout = w1.shape[2]
    pad = (kernel_size - 1) * dilation
    has_downsample = wd is not None
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    if not has_downsample:
        wd = jnp.zeros((cin, cout), x.dtype)
        bd = jnp.zeros((cout,), x.dtype)

    kernel = functools.partial(_block_kernel, kernel_size=kernel_size,
                               dilation=dilation,
                               has_downsample=has_downsample)

    flops = 2 * b * t * cin * cout * kernel_size \
        + 2 * b * t * cout * cout * kernel_size
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, pad + t, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kernel_size, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kernel_size, cout, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + w1.size + w2.size + b * t * cout) * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, w1, b1[None], w2, b2[None], wd[None], bd[None])


def weight_norm_kernel(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Materialize the weight-norm conv kernel g * v / ||v|| (per Cout)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    return v * (g[None, None, :] / jnp.maximum(norm, 1e-12))


def tcn_forward_pallas(x: jnp.ndarray, params: dict, num_channels,
                       kernel_size: int,
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """Full TemporalConvNet inference using the fused block kernel.

    ``params`` is the flax TemporalConvNet param tree ('block{i}' with
    conv1/conv2 {v, g, bias} and optional downsample).
    """
    cin = x.shape[-1]
    for i, cout in enumerate(num_channels):
        blk = params[f'block{i}']
        w1 = weight_norm_kernel(blk['conv1']['v'], blk['conv1']['g'])
        w2 = weight_norm_kernel(blk['conv2']['v'], blk['conv2']['g'])
        wd = bd = None
        if 'downsample' in blk:
            wd = blk['downsample']['proj']['dense']['kernel']
            bd = blk['downsample']['proj']['dense']['bias']
        x = fused_temporal_block(
            x, w1, blk['conv1']['bias'], w2, blk['conv2']['bias'],
            wd, bd, kernel_size=kernel_size, dilation=2 ** i,
            interpret=interpret)
        cin = cout
    return x
