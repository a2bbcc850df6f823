"""Fused whole-BottleneckIR Pallas block (serving/eval, stride-1).

The round-1/2 VERDICTs asked for the epilogue-fusion experiment at the
memory-bound stage-1 shape (40x40x64, the three identity blocks of the
ArcFace body — arcface_model.py:44-60 run via models/arcface.py
``BottleneckIR``): instead of XLA's op chain

    bn1 -> conv1(3x3) -> PReLU -> conv2(3x3) -> bn2 -> (+x)

with an HBM round-trip between each unfused pair, ONE Pallas kernel
keeps a tile of frames resident in VMEM for the whole block: the two
convs are 9-shift (T*H*W, C) @ (C, C) MXU matmuls over a padded VMEM
scratch, and bn1/PReLU/bn2/residual are VPU epilogues applied in
registers.  Eval-mode only: the BNs fold to per-channel affines
(a = scale/sqrt(var+eps), b = bias - mean*a).

HBM traffic per block drops from ~7 tensor passes (x read, t write+read,
u write+read, w write+read, x re-read, y write with XLA's partial
fusions) to 2 (x read, y write).

Measured numbers live at the END of this docstring (filled in from
tools/profile_backbone.py --bottleneck on real v5e hardware; if the
section is missing, the experiment has not been run on this checkout).
Stride-2 / channel-changing blocks keep XLA (their downsample conv +
1x1 shortcut need different scratch shapes and are compute-bound
anyway).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bn_affine(params: dict, stats: dict, eps: float = 1e-5):
    """Eval-mode BatchNorm as per-channel (a, b): y = a*x + b."""
    a = params['scale'] / jnp.sqrt(stats['var'] + eps)
    b = params['bias'] - stats['mean'] * a
    return a, b


def _block_kernel(x_ref, a1_ref, b1_ref, w1_ref, alpha_ref, w2_ref,
                  a2_ref, b2_ref, out_ref, tpad_ref, vpad_ref,
                  *, h: int, w: int):
    """One grid step: (TB, H, W, C) frames through the whole block.

    x_ref: (TB, H, W, C); w*_ref: (9, C, C); a/b/alpha: (1, C) affines;
    tpad/vpad: (TB, H+2, W+2, C) VMEM scratch (zero borders = the convs'
    'same' padding).
    """
    tb, _, _, c = x_ref.shape
    x = x_ref[:]

    # bn1 (VPU) straight into the padded conv1 input scratch
    a1 = a1_ref[0]
    b1 = b1_ref[0]
    tpad_ref[:] = jnp.zeros_like(tpad_ref)
    tpad_ref[:, 1:1 + h, 1:1 + w, :] = (
        x.astype(jnp.float32) * a1 + b1).astype(x_ref.dtype)

    # conv1: 9 shifted MXU matmuls, fp32 accumulation
    acc = jnp.zeros((tb * h * w, c), dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = tpad_ref[:, dy:dy + h, dx:dx + w, :].reshape(tb * h * w, c)
            acc += jnp.dot(xs, w1_ref[dy * 3 + dx],
                           preferred_element_type=jnp.float32)

    # PReLU epilogue into conv2's padded input scratch
    alpha = alpha_ref[0]
    u = acc.reshape(tb, h, w, c)
    v = jnp.where(u > 0, u, alpha * u)
    vpad_ref[:] = jnp.zeros_like(vpad_ref)
    vpad_ref[:, 1:1 + h, 1:1 + w, :] = v.astype(vpad_ref.dtype)

    # conv2 + bn2 + residual epilogue
    acc2 = jnp.zeros((tb * h * w, c), dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = vpad_ref[:, dy:dy + h, dx:dx + w, :].reshape(tb * h * w, c)
            acc2 += jnp.dot(xs, w2_ref[dy * 3 + dx],
                            preferred_element_type=jnp.float32)
    a2 = a2_ref[0]
    b2 = b2_ref[0]
    y = acc2.reshape(tb, h, w, c) * a2 + b2 + x.astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


def bottleneck_ir_fused(x: jnp.ndarray, block_params: dict,
                        block_stats: dict,
                        batch_tile: int = 8,
                        interpret: Optional[bool] = None) -> jnp.ndarray:
    """Eval-mode identity BottleneckIR (in_channel == depth, stride 1).

    ``block_params``/``block_stats``: the flax param/batch_stats subtree
    of one ``models.arcface.BottleneckIR`` (keys bn1, conv1, prelu,
    conv2, bn2).  Numerics pinned against the flax module in
    tests/test_bottleneck_pallas.py.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, h, w, c = x.shape

    a1, b1 = bn_affine(block_params['bn1'], block_stats['bn1'])
    a2, b2 = bn_affine(block_params['bn2'], block_stats['bn2'])
    alpha = block_params['prelu']['alpha']
    w1 = block_params['conv1']['kernel'].astype(x.dtype).reshape(9, c, c)
    w2 = block_params['conv2']['kernel'].astype(x.dtype).reshape(9, c, c)

    tn = batch_tile
    while n % tn:
        tn -= 1

    vec = lambda v: v.astype(jnp.float32).reshape(1, c)  # noqa: E731
    vspec = pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((9, c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((tn, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_block_kernel, h=h, w=w),
        grid=(n // tn,),
        in_specs=[fspec, vspec, vspec, wspec, vspec, wspec, vspec, vspec],
        out_specs=fspec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tn, h + 2, w + 2, c), x.dtype),
            pltpu.VMEM((tn, h + 2, w + 2, c), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * n * h * w * c * c,
            bytes_accessed=2 * n * h * w * c
            * jnp.dtype(x.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, vec(a1), vec(b1), w1, vec(alpha), w2, vec(a2), vec(b2))
