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

The 3x3 conv is expressed as NINE shifted (N*H*W, Cin) x (Cin, Cout)
int8 matmuls accumulated in int32 — the same decomposition as
ops/conv_pallas, but in plain XLA: every term is a dot_general the TPU
backend lowers straight onto the MXU's int8 path, with no Mosaic
relayout risk (the Winograd lesson, ops/winograd.py).  Zero padding is
exact for symmetric quantization (q(0) == 0).

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
                 out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """'same'-padded 3x3 conv with int8 MXU math.

    x: (N, H, W, Cin) float; kernel: (3, 3, Cin, Cout) float.
    Matches ``lax.conv_general_dilated(padding=(1,1))`` up to
    quantization error (pinned in tests/test_quant.py).
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
