"""Pallas TPU kernel: fused LFAN multimodal fusion block.

One kernel per (batch row, time tile) computes the whole
MultimodalTransformerEncoder (models/fusion.py, reference
transformer.py:102-215): per-modality qkv projections (MXU matmuls), the
per-(head, frame) attention over the M modality slots (unrolled on the
VPU — M<=4, head_dim 16), the +V residual, the output projection and the
LayerNorm — with every intermediate resident in VMEM.

The attention here is over modalities, not time, so each frame is
independent: the kernel tiles T freely and needs no halo.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fusion_kernel(*refs, modalities: Sequence[str], modal_dim: int,
                   num_heads: int):
    """refs: x_m... , wqkv_m..., bqkv_m..., wo, bo, ln_scale, ln_bias, out.

    x_m: (1, Tt, C_m); wqkv_m: (C_m, 3E); out: (1, Tt, E*M).
    """
    m_count = len(modalities)
    xs = refs[:m_count]
    wqkv = refs[m_count:2 * m_count]
    bqkv = refs[2 * m_count:3 * m_count]
    wo, bo, ln_scale, ln_bias, out_ref = refs[3 * m_count:]

    e = modal_dim
    h = num_heads
    hd = e // h
    scale = 1.0 / math.sqrt(hd)

    # per-modality packed qkv: (Tt, 3E) each
    qkv = []
    for i in range(m_count):
        x = xs[i][0]
        qkv.append(jnp.dot(x, wqkv[i][:], preferred_element_type=jnp.float32)
                   + bqkv[i][0])

    def part(i, which, head):  # (Tt, hd) slice of q/k/v for modality i
        # packed layout follows the reference reshape (B,T,H,3hd):
        # head-major, [q(hd), k(hd), v(hd)] within each head
        # (transformer.py:142-144)
        base = head * 3 * hd + which * hd
        return qkv[i][:, base:base + hd]

    # attention over modality slots, unrolled (M<=4, H small)
    values: List = []
    for head in range(h):
        ks = [part(i, 1, head) for i in range(m_count)]
        vs = [part(i, 2, head) for i in range(m_count)]
        for m1 in range(m_count):
            q = part(m1, 0, head)
            logits = [jnp.sum(q * ks[m2], axis=1, keepdims=True) * scale
                      for m2 in range(m_count)]
            mx = logits[0]
            for l in logits[1:]:
                mx = jnp.maximum(mx, l)
            exps = [jnp.exp(l - mx) for l in logits]
            denom = exps[0]
            for ex in exps[1:]:
                denom = denom + ex
            val = exps[0] / denom * vs[0]
            for m2 in range(1, m_count):
                val = val + exps[m2] / denom * vs[m2]
            values.append(val + vs[m1])  # +V residual (transformer.py:157)

    # (B,H,T,M,hd) -> permute (B,T,H,M,hd) -> reshape (Tt, H*M*hd):
    # head-major then modality, matching transformer.py:158-159; my
    # generation order (head outer, m inner) IS that order
    cat = jnp.concatenate(values, axis=1)  # (Tt, E*M)

    o = jnp.dot(cat, wo[:], preferred_element_type=jnp.float32) + bo[0]

    mean = jnp.mean(o, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(o - mean), axis=1, keepdims=True)
    normed = (o - mean) * jax.lax.rsqrt(var + 1e-5)
    out_ref[0] = (normed * ln_scale[0] + ln_bias[0]).astype(out_ref.dtype)


def pick_time_tile(t: int, max_tile: int = 128) -> int:
    """Largest divisor of t that is <= max_tile AND a multiple of 8
    (Mosaic sublane constraint); falls back to the full length, which is
    always legal."""
    for tt in range(min(max_tile, t), 7, -1):
        if t % tt == 0 and tt % 8 == 0:
            return tt
    return t


def fused_multimodal_fusion(x: Dict[str, jnp.ndarray], params: dict,
                            modalities: Sequence[str], modal_dim: int,
                            num_heads: int, time_tile: int = 128,
                            interpret: Optional[bool] = None
                            ) -> jnp.ndarray:
    """Inference-mode MultimodalTransformerEncoder as one Pallas kernel.

    ``params`` is the flax 'fusion' subtree: self_attn.qkv_<m>/o_proj
    (TorchLinear trees) and norm1 (LayerNorm).  x: {m: (B, T, C_m)}.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    mods = list(modalities)
    b, t, _ = x[mods[0]].shape
    em = modal_dim * len(mods)

    tt = pick_time_tile(t, time_tile)
    grid = (b, t // tt)

    attn = params['self_attn']
    inputs = []
    in_specs = []
    for m in mods:
        cm = x[m].shape[-1]
        inputs.append(x[m])
        in_specs.append(pl.BlockSpec((1, tt, cm),
                                     lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM))
    for m in mods:
        k = attn[f'qkv_{m}']['dense']
        inputs.append(k['kernel'])
        in_specs.append(pl.BlockSpec(k['kernel'].shape,
                                     lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    for m in mods:
        k = attn[f'qkv_{m}']['dense']
        inputs.append(k['bias'][None])
        in_specs.append(pl.BlockSpec((1, k['bias'].shape[0]),
                                     lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    o = attn['o_proj']['dense']
    ln = params['norm1']
    for arr, shape in [(o['kernel'], o['kernel'].shape),
                       (o['bias'][None], (1, em)),
                       (ln['scale'][None], (1, em)),
                       (ln['bias'][None], (1, em))]:
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _fusion_kernel, modalities=tuple(mods), modal_dim=modal_dim,
        num_heads=num_heads,
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tt, em), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, em), jnp.float32),
        interpret=interpret,
    )(*inputs)
