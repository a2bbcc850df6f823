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
            bytes_accessed=(xp.size + w1.size + w2.size
                            + b * t * cout)
            * jnp.dtype(x.dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, w1, b1[None], w2, b2[None], wd[None], bd[None])


# --------------------------------------------------------------- train path
# The same fused block with a custom VJP so TRAINING rides the kernel
# too (round-1 kernels were inference-only).  Two design choices keep it
# simple and exactly testable:
#   * dropout masks are built OUTSIDE (jax.random on the step's dropout
#     rng), pre-scaled to {0, 1/(1-p)}, and passed in: they land in the
#     VJP residuals, so backward reuses the exact masks with no
#     in-kernel PRNG (which interpret mode cannot run on CPU);
#   * the 1x1 residual downsample stays an XLA matmul outside; the
#     kernel receives the residual stream `res` and returns its
#     cotangent, so downsample/weight-norm grads flow through ordinary
#     autodiff.


def _block_train_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        m1_ref, m2_ref, res_ref, out_ref, *,
                        kernel_size: int, dilation: int):
    """Forward with dropout masks m1/m2 applied after each leaky."""
    pad = (kernel_size - 1) * dilation
    t = out_ref.shape[1]
    x = x_ref[0]

    acc = jnp.zeros((t, w1_ref.shape[2]), dtype=jnp.float32)
    for k in range(kernel_size):
        xs = x[k * dilation:k * dilation + t]
        acc += jnp.dot(xs, w1_ref[k], preferred_element_type=jnp.float32)
    h = _leaky(acc + b1_ref[0]) * m1_ref[0]

    hp = jnp.concatenate(
        [jnp.zeros((pad, h.shape[1]), dtype=h.dtype), h], axis=0)
    acc2 = jnp.zeros((t, w2_ref.shape[2]), dtype=jnp.float32)
    for k in range(kernel_size):
        hs = hp[k * dilation:k * dilation + t]
        acc2 += jnp.dot(hs, w2_ref[k], preferred_element_type=jnp.float32)
    net = _leaky(acc2 + b2_ref[0]) * m2_ref[0]

    out_ref[0] = _leaky(net + res_ref[0]).astype(out_ref.dtype)


def _block_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      m1_ref, m2_ref, res_ref, g_ref,
                      dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                      dres_ref, *, kernel_size: int, dilation: int):
    """Fused backward: recompute the forward in VMEM, then accumulate
    input/weight grads.  Weight grads accumulate across the sequential
    (B,) grid into shared output blocks."""
    pad = (kernel_size - 1) * dilation
    t = g_ref.shape[1]
    i = pl.program_id(0)

    x = x_ref[0]
    m1 = m1_ref[0]
    m2 = m2_ref[0]

    # ---- recompute forward
    a1 = jnp.zeros((t, w1_ref.shape[2]), dtype=jnp.float32)
    for k in range(kernel_size):
        a1 += jnp.dot(x[k * dilation:k * dilation + t], w1_ref[k],
                      preferred_element_type=jnp.float32)
    a1 = a1 + b1_ref[0]
    h = _leaky(a1) * m1
    hp = jnp.concatenate(
        [jnp.zeros((pad, h.shape[1]), dtype=h.dtype), h], axis=0)
    a2 = jnp.zeros((t, w2_ref.shape[2]), dtype=jnp.float32)
    for k in range(kernel_size):
        a2 += jnp.dot(hp[k * dilation:k * dilation + t], w2_ref[k],
                      preferred_element_type=jnp.float32)
    a2 = a2 + b2_ref[0]
    net = _leaky(a2) * m2

    def dleaky(z):
        return jnp.where(z >= 0, 1.0, NEG_SLOPE)

    def add_shifted(acc, contrib, offset, total):
        """acc + contrib placed at rows [offset, offset+t): built from
        static zero-block concatenation — a value-level .at[].add lowers
        to scatter-add, which Mosaic cannot compile (caught on real TPU;
        interpret-mode tests do not exercise the lowering)."""
        parts = []
        if offset:
            parts.append(jnp.zeros((offset, contrib.shape[1]),
                                   contrib.dtype))
        parts.append(contrib)
        tail = total - offset - contrib.shape[0]
        if tail:
            parts.append(jnp.zeros((tail, contrib.shape[1]),
                                   contrib.dtype))
        return acc + (parts[0] if len(parts) == 1
                      else jnp.concatenate(parts, axis=0))

    # ---- backward
    g = g_ref[0].astype(jnp.float32)
    gz = g * dleaky(net + res_ref[0])
    d_a2 = gz * m2 * dleaky(a2)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    db2_ref[0] += jnp.sum(d_a2, axis=0)
    d_hp = jnp.zeros((pad + t, h.shape[1]), dtype=jnp.float32)
    for k in range(kernel_size):
        dw2_ref[k] += jnp.dot(
            hp[k * dilation:k * dilation + t].T, d_a2,
            preferred_element_type=jnp.float32)
        d_hp = add_shifted(
            d_hp,
            jnp.dot(d_a2, w2_ref[k].T,
                    preferred_element_type=jnp.float32),
            k * dilation, pad + t)

    d_a1 = d_hp[pad:] * m1 * dleaky(a1)
    db1_ref[0] += jnp.sum(d_a1, axis=0)
    dx = jnp.zeros((pad + t, x.shape[1]), dtype=jnp.float32)
    for k in range(kernel_size):
        dw1_ref[k] += jnp.dot(
            x[k * dilation:k * dilation + t].T, d_a1,
            preferred_element_type=jnp.float32)
        dx = add_shifted(
            dx,
            jnp.dot(d_a1, w1_ref[k].T,
                    preferred_element_type=jnp.float32),
            k * dilation, pad + t)

    dx_ref[0] = dx[pad:].astype(dx_ref.dtype)
    dres_ref[0] = gz.astype(dres_ref.dtype)


def _vmem(block, index_map):
    return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=64)
def _make_fused_block_train(kernel_size: int, dilation: int,
                            interpret: bool):
    pad = (kernel_size - 1) * dilation

    def _w_specs(cin, cout):
        return [
            _vmem((kernel_size, cin, cout), lambda i: (0, 0, 0)),
            _vmem((1, cout), lambda i: (0, 0)),
            _vmem((kernel_size, cout, cout), lambda i: (0, 0, 0)),
            _vmem((1, cout), lambda i: (0, 0)),
        ]

    def fwd_call(xp, w1, b1, w2, b2, m1, m2, res):
        b, tp, cin = xp.shape
        t = tp - pad
        cout = w1.shape[2]
        kernel = functools.partial(
            _block_train_kernel, kernel_size=kernel_size,
            dilation=dilation)
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[_vmem((1, pad + t, cin), lambda i: (i, 0, 0))]
            + _w_specs(cin, cout)
            + [_vmem((1, t, cout), lambda i: (i, 0, 0))] * 3,
            out_specs=_vmem((1, t, cout), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, t, cout), xp.dtype),
            interpret=interpret,
        )(xp, w1, b1[None], w2, b2[None], m1, m2, res)

    def bwd_call(xp, w1, b1, w2, b2, m1, m2, res, g):
        b, tp, cin = xp.shape
        t = tp - pad
        cout = w1.shape[2]
        kernel = functools.partial(
            _block_bwd_kernel, kernel_size=kernel_size, dilation=dilation)
        out_specs = (
            _vmem((1, t, cin), lambda i: (i, 0, 0)),
            _vmem((kernel_size, cin, cout), lambda i: (0, 0, 0)),
            _vmem((1, cout), lambda i: (0, 0)),
            _vmem((kernel_size, cout, cout), lambda i: (0, 0, 0)),
            _vmem((1, cout), lambda i: (0, 0)),
            _vmem((1, t, cout), lambda i: (i, 0, 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((b, t, cin), jnp.float32),
            jax.ShapeDtypeStruct((kernel_size, cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((kernel_size, cout, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, t, cout), jnp.float32),
        )
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[_vmem((1, pad + t, cin), lambda i: (i, 0, 0))]
            + _w_specs(cin, cout)
            + [_vmem((1, t, cout), lambda i: (i, 0, 0))] * 4,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(xp, w1, b1[None], w2, b2[None], m1, m2, res, g)

    @jax.custom_vjp
    def fused(x, w1, b1, w2, b2, m1, m2, res):
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return fwd_call(xp, w1, b1, w2, b2, m1, m2, res)

    def fused_fwd(x, w1, b1, w2, b2, m1, m2, res):
        out = fused(x, w1, b1, w2, b2, m1, m2, res)
        return out, (x, w1, b1, w2, b2, m1, m2, res)

    def fused_bwd(residuals, g):
        x, w1, b1, w2, b2, m1, m2, res = residuals
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        dx, dw1, db1, dw2, db2, dres = bwd_call(
            xp, w1, b1, w2, b2, m1, m2, res, g)
        return (dx.astype(x.dtype), dw1, db1[0], dw2, db2[0],
                jnp.zeros_like(m1), jnp.zeros_like(m2),
                dres.astype(res.dtype))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_temporal_block_train(x, w1, b1, w2, b2, m1, m2, res, *,
                               kernel_size: int, dilation: int,
                               interpret: Optional[bool] = None):
    """Differentiable fused block: x (B,T,Cin); masks m1/m2 (B,T,Cout)
    pre-scaled to {0, 1/(1-p)} (ones for dropout 0); res (B,T,Cout) the
    residual stream (x itself, or the 1x1 downsample output)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    fn = _make_fused_block_train(kernel_size, dilation, bool(interpret))
    return fn(x, w1, b1, w2, b2, m1, m2, res)


def weight_norm_kernel(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Materialize the weight-norm conv kernel (shared definition)."""
    from fvt_tpu.models.layers import materialize_weight_norm
    return materialize_weight_norm(v, g)


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
