"""int8 quantized convolution for frozen-backbone serving.

The ArcFace ResNet-50 forward is the FLOPs monster of the pipeline
(reference models/arcface_model.py:147-151 runs it per frame); on TPU
v5e the MXU multiplies int8 at 2x the bf16 rate (394 vs 197 TOPS), so a
weight+activation int8 path doubles the compute ceiling of the frozen
backbone at serving time.

Scheme (--serve_quant int8, serving only — training math is untouched):

  * weights: symmetric per-OUTPUT-CHANNEL int8, scale = max|w|/127 over
    (kh, kw, cin).  The backbone is frozen, so XLA hoists/reuses the
    quantized weights across steps.
  * activations: symmetric per-TENSOR dynamic int8 (scale from the
    live batch's max|x|).  The conv inputs here are post-BN / post-PReLU
    activations, zero-centered by construction, so symmetric
    quantization is the right shape.
  * accumulation in int32 on the MXU (s8 x s8 -> s32), dequantized in
    the epilogue by (x_scale * w_scale[cout]).

The 3x3 conv is ONE ``lax.conv_general_dilated`` with s8 operands and
``preferred_element_type=int32`` — XLA's TPU backend lowers that
directly onto the MXU's int8 path.  Zero padding is exact for symmetric
quantization (q(0) == 0).

Round-3 ablation (/tmp/int8_ablate.py, 16-op chains per jit to amortize
the axon sync floor, v5e): per-conv ms at the four backbone stage
shapes, 2400 frames —

    shape        bf16 conv   int8 single conv   int8 9-matmul
    40x40x64        4.60          4.88              31.7
    20x20x128       3.57          2.91              16.5
    10x10x256       3.49          2.78               8.3
    5x5x512         4.03          2.92               4.9

The original NINE-shifted-matmul decomposition (kept in
``conv3x3_int8_9mm`` for the record) was 1.7-6.9x SLOWER than bf16:
consecutive ``dot_general``s do not fuse, so the (N*H*W, Cout) int32
accumulator round-trips HBM between all nine terms — at 40x40 that is
~9 extra r/w passes over a 983 MB accumulator.  The single conv beats
bf16 by 1.2-1.4x everywhere except the first stage (64-ch: int8 tiling
can't fill the MXU better than bf16 there), so stage 1 stays bf16 in
the backbone's int8 mode (models/arcface.py gates on Cin>=128).

Accuracy contract: quantization CHANGES numerics.  The measured deltas
(tools/quant_delta.py, synthetic store + torch-ported backbone weights
via tests/test_backbone_parity.py machinery) are recorded in
DESIGN.md; the serving flag is opt-in and rejected for training mode at
parse time.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_symmetric(x: jnp.ndarray, axes=None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(int8 values, fp32 scale) with q = clip(round(x/scale), ±127).

    ``axes`` are the REDUCED axes (None = per-tensor).  Symmetric, no
    zero point: q(0) == 0 exactly, so zero padding commutes with
    quantization.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes,
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def conv3x3_int8(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
                 out_dtype=jnp.bfloat16, x_scale=None) -> jnp.ndarray:
    """'same'-padded 3x3 conv with int8 MXU math.

    x: (N, H, W, Cin) float; kernel: (3, 3, Cin, Cout) float.
    Matches ``lax.conv_general_dilated(padding=(1,1))`` up to
    quantization error (pinned in tests/test_quant.py).

    ``x_scale``: optional precomputed (calibrated) per-tensor activation
    scale.  When given, the dynamic max|x| reduction pass is skipped —
    the quantize becomes one fused multiply/round/clip/cast that XLA
    folds into the producer's epilogue.  The backbone is frozen, so the
    activation distribution is stationary and a scale calibrated once
    per checkpoint (models/arcface.py 'act_scales' collection) is valid
    for the whole serving run; values beyond the calibrated amax clip
    to ±127 like any symmetric-int8 outlier.
    """
    kh, kw, _, cout = kernel.shape
    assert (kh, kw) == (3, 3), (kh, kw)

    wq, wscale = quantize_symmetric(kernel, axes=(0, 1, 2))  # (1,1,1,Cout)
    if x_scale is None:
        xq, xscale = quantize_symmetric(x)                   # scalar
    else:
        xscale = jnp.asarray(x_scale, jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xscale),
                      -127, 127).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)

    deq = acc.astype(jnp.float32) * (xscale * wscale.reshape(1, 1, 1, -1))
    return deq.astype(out_dtype)


def conv3x3_int8_9mm(x: jnp.ndarray, kernel: jnp.ndarray,
                     stride: int = 1,
                     out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """NEGATIVE RESULT, kept for the record (see module docstring):
    the 3x3 conv as nine shifted int8 matmuls.  1.7-6.9x slower than
    bf16 on v5e — the int32 accumulator round-trips HBM between the
    nine unfused ``dot_general``s.  Use :func:`conv3x3_int8`.
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    assert (kh, kw) == (3, 3), (kh, kw)

    wq, wscale = quantize_symmetric(kernel, axes=(0, 1, 2))  # (1,1,1,Cout)
    xq, xscale = quantize_symmetric(x)                       # scalar

    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ho = (h + 2 - 3) // stride + 1
    wo = (w + 2 - 3) // stride + 1

    acc = jnp.zeros((n, ho, wo, cout), jnp.int32)
    for ky in range(3):
        for kx in range(3):
            xs = jax.lax.slice(
                xp,
                (0, ky, kx, 0),
                (n, ky + (ho - 1) * stride + 1,
                 kx + (wo - 1) * stride + 1, cin),
                (1, stride, stride, 1))
            acc = acc + jax.lax.dot_general(
                xs, wq[ky, kx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    deq = acc.astype(jnp.float32) * (xscale * wscale.reshape(1, 1, 1, -1))
    return deq.astype(out_dtype)


def calibrate_act_scales(model, params, batch_stats, sample_batch):
    """Record per-conv max|x| activation scales over one representative
    batch for ``--serve_quant int8_static`` — the frozen backbone's
    post-BN/PReLU activation ranges are stationary across a run, so one
    batch suffices (measured quality bound: tools/quant_delta.py).

    Shared by the live path (train/trainer.py::Trainer.calibrate_quant)
    and the frozen-artifact export (tools/export_serving.py), so the
    two cannot drift apart.  Returns the host-side ``act_scales``
    variable collection; raises if the model recorded none (backbone
    not running with conv_impl='int8')."""
    from fvt_tpu.train.steps import _device_transform

    inputs = {k: jnp.asarray(v) for k, v in sample_batch.items()
              if 'continuous_label' not in k}

    @jax.jit
    def calib(params, stats, inputs):
        x = _device_transform(inputs, train=False)
        _, mut = model.apply(
            {'params': params, 'batch_stats': stats}, x,
            train=False, mutable=['act_scales'])
        return mut['act_scales']

    scales = jax.device_get(calib(params, batch_stats, inputs))
    n = len(jax.tree.leaves(scales))
    if n == 0:
        raise ValueError(
            'calibration recorded no activation scales — is the '
            'backbone running with conv_impl=int8 (serve_quant '
            'int8/int8_static)?')
    return scales
