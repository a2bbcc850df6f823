"""Pallas TPU kernel: 3x3 stride-1 conv for small-spatial ResNet stages.

At 10x10/5x5 spatial the ArcFace body's convs underutilize XLA's conv
tiling; expressed as 9 shifted (N*H*W, C) @ (C, Co) MXU matmuls with the
padded activation tile resident in VMEM, the conv becomes pure
matmul-shaped work.  Used by the serving path experiments; stride-2 convs
stay on XLA.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_ref, w_ref, out_ref, *, h: int, w: int):
    """x_ref: (Tn, H+2, W+2, C) pre-padded; w_ref: (9, C, Co);
    out_ref: (Tn, H, W, Co)."""
    tn = x_ref.shape[0]
    c = x_ref.shape[3]
    co = w_ref.shape[2]

    acc = jnp.zeros((tn * h * w, co), dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[:, dy:dy + h, dx:dx + w, :]
            xs = xs.reshape(tn * h * w, c)
            acc += jnp.dot(xs, w_ref[dy * 3 + dx],
                           preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(tn, h, w, co).astype(out_ref.dtype)


def conv3x3_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                   batch_tile: int = 64,
                   interpret: Optional[bool] = None) -> jnp.ndarray:
    """NHWC 3x3 stride-1 pad-1 conv; kernel HWIO (3, 3, C, Co)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, h, w, c = x.shape
    co = kernel.shape[3]

    tn = batch_tile
    while n % tn:
        tn -= 1

    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wflat = kernel.reshape(9, c, co)

    return pl.pallas_call(
        functools.partial(_conv3x3_kernel, h=h, w=w),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, h + 2, w + 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, h, w, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * c * co * 9,
            bytes_accessed=(xpad.size + wflat.size + n * h * w * co)
            * jnp.dtype(x.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xpad, wflat)
