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

MEASURED RESULT (real v5e, bf16, n=2400 frames, 8-block chains, forced-
result timing, 2026-08-17): **NEGATIVE — direct XLA conv stays.** The
fused block loses ~2x at every shape where it compiles and Mosaic-OOMs
at every larger tile:

    stage        XLA ms/blk (MFU)   fused ms/blk (MFU)      speedup
    40x40x64     11.14 (25.8%)      19.67 tile=1|2 (14.6%)  0.57x
                                    tile>=4: VMEM stack OOM
                                    (41.3 MB vs 16 MB limit @tile=8)
    20x20x128     7.61 (37.8%)      15.78 tile=8  (18.2%)   0.48x
                                    tile=16: OOM
    10x10x256     7.31 (39.3%)      tile=16|32: OOM
    5x5x512       7.09 (40.5%)      tile=32|64: OOM

Why (ablation):
 1. The 18 shifted slices tpad[:, dy:dy+h, dx:dx+w, :] offset the
    second-minor (sublane) dim, so Mosaic materializes a relayout COPY
    of the whole tile for each — ~18 tile-sized VPU passes per block,
    and value-level unrolled accumulation keeps them live on the
    kernel stack (the OOM; the stack limit is 16 MB).
 2. At c=64 (stage 1) every (tb,h,w,64)->(tb*h*w,64) reshape splits
    128-wide lane rows — more relayouts; c>=128 stages align but still
    pay (1); c>=256 stages additionally hold 2x(9,c,c) weight copies
    (9.4 MB bf16 at c=512), shrinking the safe tile to nothing.
 3. The premise itself is capped: XLA already fuses the BN/PReLU
    epilogues into its convs — measured full-block vs conv-only XLA
    chains differ by only 13.9% / 7.4% / 6.1% / 1.3% at the four
    stages, so a PERFECT epilogue-fusion scheme buys <14% while this
    one costs +77..107%.  Together with the Winograd negative result
    (ops/winograd.py: 2.2-13x slower, relayout-dominated), the
    conclusion is that XLA's direct small-spatial convs on TPU are
    already at their practical shape; transform- or fusion-domain
    Pallas rewrites of this backbone lose to Mosaic relayout cost.

The kernel is kept as a parity-tested archived experiment:
``arcface_forward_eval(fused_blocks=False)`` is the default, the
profiler (tools/profile_backbone.py --bottleneck) reproduces the table,
and ``safe_batch_tile`` clamps any requested tile to the measured
VMEM-safe boundary (falling back to plain XLA ops when no tile fits)
so no caller can hit the Mosaic OOM.  Stride-2 / channel-changing
blocks always keep XLA (their downsample conv + 1x1 shortcut need
different scratch shapes and are compute-bound anyway).
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


def safe_batch_tile(n: int, h: int, w: int, c: int,
                    itemsize: int, requested: int) -> int:
    """Largest batch tile <= ``requested`` that divides ``n`` and stays
    inside the MEASURED Mosaic VMEM-stack envelope; 0 if none does
    (caller falls back to the XLA op chain).

    Two guards, both from the v5e tile sweep in the module docstring:

      * a per-stage hard cap at the largest tile that actually RAN
        ((2,40,40,64) ok, (8,20,20,128) ok) — stages where every probed
        tile OOMed ((..,10,10,256), (..,5,5,512)) return 0 outright
        rather than extrapolating the linear stack model into a region
        with zero validated points (the model underestimated the one
        large measured stack by ~4%, and stack growth need not stay
        linear per stage);
      * the linear estimate (stack ~ 6x lane-padded fp32 tile volume
        from the ~18 live shifted-slice relayout copies + 3x the two
        (9,c,c) weight tensors) against a budget BELOW the smallest
        measured OOM (16.9 MB) — belt and braces for off-sweep shapes
        that hash to a validated stage.
    """
    measured_ok = {(40, 40): 2, (20, 20): 8}  # (h, w) -> max OK tile
    cap = measured_ok.get((h, w))
    if cap is None:
        return 0  # no validated point at this stage: XLA chain
    budget = 12e6  # > largest measured-OK stack (11.6M est), < 16.9M OOM
    weights = 3 * 2 * 9 * c * c * itemsize
    tn = min(requested, n, cap)
    while tn:
        while tn and n % tn:
            tn -= 1
        if not tn:
            break
        est = 6 * tn * h * w * max(c, 128) * 4 + weights
        if est <= budget:
            return tn
        tn -= 1
    return 0


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
    tests/test_bottleneck_pallas.py.  ``batch_tile`` is clamped to the
    measured VMEM-safe boundary (``safe_batch_tile``); when no tile
    fits (c>=512 weights alone approach the stack limit) the same math
    runs as plain XLA ops instead of crashing Mosaic.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, h, w, c = x.shape

    a1, b1 = bn_affine(block_params['bn1'], block_stats['bn1'])
    a2, b2 = bn_affine(block_params['bn2'], block_stats['bn2'])
    alpha = block_params['prelu']['alpha']
    w1 = block_params['conv1']['kernel'].astype(x.dtype).reshape(9, c, c)
    w2 = block_params['conv2']['kernel'].astype(x.dtype).reshape(9, c, c)

    tn = safe_batch_tile(n, h, w, c, jnp.dtype(x.dtype).itemsize,
                         batch_tile) if not interpret else batch_tile
    while tn and n % tn:
        tn -= 1
    if not tn:
        k1 = block_params['conv1']['kernel'].astype(x.dtype)
        k2 = block_params['conv2']['kernel'].astype(x.dtype)
        t = (x.astype(jnp.float32) * a1 + b1).astype(x.dtype)
        u = jax.lax.conv_general_dilated(
            t, k1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        v = jnp.where(u >= 0, u, u * alpha.astype(u.dtype))
        r = jax.lax.conv_general_dilated(
            v, k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = (r.astype(jnp.float32) * a2 + b2 + x.astype(jnp.float32))
        return y.astype(x.dtype)

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
