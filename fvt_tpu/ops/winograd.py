"""Winograd F(2x2, 3x3) convolution for the ArcFace backbone's stride-1
3x3 convs (the FLOPs monster of the whole pipeline: reference hot loop
/root/reference/models/arcface_model.py:147-151 runs B*T frames through
48 such convs; ~93% of backbone FLOPs are stride-1 3x3).

Winograd trades the 9-tap direct convolution for 16 transform-domain
(N*tiles, Cin) @ (Cin, Cout) matmuls — a 2.25x multiply reduction that
maps straight onto the MXU.  The input/output transforms are exact in
bf16 (the F(2,3) transform matrices B^T and A^T contain only 0/±1; the
weight transform G contains halves, also exact), so the only numerical
difference vs direct convolution is the reordering of additions.

Two implementations:
  * ``conv3x3_winograd``          — pure XLA ops (transforms materialize
                                    the 4x tile tensor in HBM).
  * ``conv3x3_winograd_pallas``   — fused Pallas kernel: the activation
                                    tile stays in VMEM through transform
                                    -> 16 matmuls -> inverse transform,
                                    so HBM traffic is read-x + write-y
                                    only (ops/conv_pallas.py's shifted-
                                    matmul direct conv was a measured
                                    wash vs XLA; the FLOP cut is the
                                    remaining lever).

Both take NHWC activations and HWIO (3, 3, Cin, Cout) kernels with
stride 1, padding 1 ("same"), matching flax.linen.Conv defaults used by
fvt_tpu.models.arcface.

MEASURED NEGATIVE RESULT (v5e, chained-op harness, bf16, N=2400 — see
tools/profile_backbone.py):

    shape          direct-XLA   winograd-XLA   winograd-pallas
    40x40x64       4.8 ms        64.5 ms        (vmem-bound)
    20x20x128      3.7 ms        19.1 ms        (vmem-bound)
    10x10x256      3.45 ms       10.1 ms        7.6 ms
    5x5x512        3.48 ms        8.5 ms        7.9 ms

The XLA variant is memory-bound on the materialized 4x transform-domain
tensors.  The Pallas variant's ablation (matmuls-only on pre-flattened
input: 2.6 ms; + halo slicing/reshape: 7.4 ms; transform adds: free)
shows the cost is Mosaic relayouts for the misaligned halo slices and
the (tn, th, tw, C)->(P, C) collapses, and even the matmul-only upper
bound is just 1.34x over XLA's direct conv — whose effective 30-42% MFU
at these shapes is already near the workload's roofline.  The 2.25x
multiply reduction therefore does NOT translate into wall-clock on this
hardware generation; the direct path stays the default.  Kept (with
parity tests) as infrastructure and as the honest record.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def transform_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO (3, 3, C, Co) -> transform-domain (4, 4, C, Co): U = G g G^T.

    G = [[1, 0, 0], [1/2, 1/2, 1/2], [1/2, -1/2, 1/2], [0, 0, 1]] applied
    separately over the two spatial taps.  Computed in fp32 (exact: the
    coefficients are 0/±1/±1/2).
    """
    g = kernel.astype(jnp.float32)

    def g_rows(w):  # contract leading 3-tap axis with G -> 4
        return jnp.stack([
            w[0],
            0.5 * (w[0] + w[1] + w[2]),
            0.5 * (w[0] - w[1] + w[2]),
            w[2],
        ])

    u = g_rows(g)                                  # (4, 3, C, Co)
    u = g_rows(u.transpose(1, 0, 2, 3))            # (4, 4, C, Co)
    return u.transpose(1, 0, 2, 3)                 # back to (row, col)


def _bt_pairs(x0, x1, x2, x3):
    """Apply B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]] along one
    tap axis given the four tap slices."""
    return (x0 - x2, x1 + x2, x2 - x1, x1 - x3)


def _at_pairs(m0, m1, m2, m3):
    """Apply A^T = [[1,1,1,0],[0,1,-1,-1]] along one tap axis."""
    return (m0 + m1 + m2, m1 - m2 - m3)


def _pad_for_tiles(x: jnp.ndarray):
    """'same' pad + right/bottom pad so spatial extent = 2*tiles + 2."""
    n, h, w, c = x.shape
    th, tw = -(-h // 2), -(-w // 2)
    return (jnp.pad(x, ((0, 0), (1, 1 + (2 * th - h)),
                        (1, 1 + (2 * tw - w)), (0, 0))), th, tw)


def conv3x3_winograd(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """NHWC 3x3 stride-1 pad-1 conv via Winograd F(2x2, 3x3), XLA ops.

    Matmuls run in x.dtype with fp32 accumulation; transforms are exact
    add/subs.  Returns x.dtype.
    """
    n, h, w, c = x.shape
    co = kernel.shape[3]
    xp, th, tw = _pad_for_tiles(x)

    u = transform_weights(kernel).astype(x.dtype)  # (4, 4, C, Co)

    # d[a][b](ty, tx) = xp[:, 2*ty + a, 2*tx + b, :]  (strided slices)
    d = [[jax.lax.slice(xp, (0, a, b, 0),
                        (n, a + 2 * th - 1, b + 2 * tw - 1, c),
                        (1, 2, 2, 1))
          for b in range(4)] for a in range(4)]

    # V = B^T d B, applied tap-axis by tap-axis (pure add/sub)
    rows = [_bt_pairs(d[0][b], d[1][b], d[2][b], d[3][b]) for b in range(4)]
    v = [[None] * 4 for _ in range(4)]
    for a in range(4):
        va = _bt_pairs(rows[0][a], rows[1][a], rows[2][a], rows[3][a])
        for b in range(4):
            v[a][b] = va[b]

    # 16 transform-domain matmuls on the MXU
    p = n * th * tw
    m = [[jax.lax.dot(v[a][b].reshape(p, c), u[a, b],
                      preferred_element_type=jnp.float32)
          for b in range(4)] for a in range(4)]

    # Y = A^T m A
    ya = [_at_pairs(m[0][b], m[1][b], m[2][b], m[3][b]) for b in range(4)]
    out = [[None] * 2 for _ in range(2)]
    for i in range(2):
        oi = _at_pairs(ya[0][i], ya[1][i], ya[2][i], ya[3][i])
        for j in range(2):
            out[i][j] = oi[j]

    y = jnp.stack([jnp.stack(out[0]), jnp.stack(out[1])])  # (2, 2, P, Co)
    y = y.reshape(2, 2, n, th, tw, co).transpose(2, 3, 0, 4, 1, 5)
    y = y.reshape(n, 2 * th, 2 * tw, co)[:, :h, :w, :]
    return y.astype(x.dtype)


# ------------------------------------------------------------------ Pallas
def _winograd_kernel(x_ref, u_ref, out_ref, *, th: int, tw: int):
    """One batch tile, phase-decomposed in and out, phases packed on the
    CHANNEL axis (keeps the lane dimension a multiple of 128 even at
    C=64 and avoids Mosaic's stride-2 vector-slice limitation).

    x_ref: (Tn, th+1, tw+1, 4*C) — input phases
    x[..., p*C:(p+1)*C][ty, tx] = xp[2*ty + pa, 2*tx + pb], p = 2*pa+pb.
    u_ref: (16, C, Co) transformed weights.
    out_ref: (Tn, th, tw, 4*Co) — output phases
    out[..., (2*i+j)*Co:][ty, tx] = y[2*ty + i, 2*tx + j].

    The inverse transform is distributed over the 16 matmuls: each M_ab
    contributes to the four output phases with coefficient
    AT[i,a]*AT[j,b] in {-1, 0, +1}, so only 4 fp32 accumulators live in
    VMEM alongside one V_ab at a time.
    """
    tn = x_ref.shape[0]
    c = x_ref.shape[3] // 4
    co = u_ref.shape[2]
    p = tn * th * tw

    def tap(a, b):  # d_ab: (Tn, th, tw, C), unit-stride slice of a phase
        ph = (a % 2) * 2 + b % 2
        return x_ref[:, a // 2:a // 2 + th, b // 2:b // 2 + tw,
                     ph * c:(ph + 1) * c]

    # a-th row of B^T applied to the four row-taps of column b
    def bt_row(a, b):
        if a == 0:
            return tap(0, b) - tap(2, b)
        if a == 1:
            return tap(1, b) + tap(2, b)
        if a == 2:
            return tap(2, b) - tap(1, b)
        return tap(1, b) - tap(3, b)

    at = ((1, 1, 1, 0), (0, 1, -1, -1))
    acc = [[jnp.zeros((p, co), jnp.float32) for _ in range(2)]
           for _ in range(2)]
    # stream over a: only one row-quad + one V_ab live at a time
    for a in range(4):
        vs = _bt_pairs(bt_row(a, 0), bt_row(a, 1), bt_row(a, 2),
                       bt_row(a, 3))
        for b in range(4):
            ca = (at[0][a], at[1][a])
            cb = (at[0][b], at[1][b])
            if not any(ca) or not any(cb):
                continue
            m = jnp.dot(vs[b].reshape(p, c), u_ref[a * 4 + b],
                        preferred_element_type=jnp.float32)
            for i in range(2):
                for j in range(2):
                    cij = ca[i] * cb[j]
                    if cij == 1:
                        acc[i][j] = acc[i][j] + m
                    elif cij == -1:
                        acc[i][j] = acc[i][j] - m

    out_ref[:] = jnp.concatenate(
        [acc[i][j].reshape(tn, th, tw, co)
         for i in range(2) for j in range(2)],
        axis=-1).astype(out_ref.dtype)


def _pick_tiles(n, th, tw, c, co, itemsize, budget=11 * 2 ** 20):
    """(tn, cot) so the kernel's live VMEM (incl. Mosaic's double
    buffering of every grid-mapped block) stays under ``budget``."""

    def live_bytes(tn, cot):
        p = tn * th * tw
        return (2 * 4 * tn * (th + 1) * (tw + 1) * c * itemsize  # x, dbl
                + 8 * p * c * itemsize                 # row quad + V
                + 4 * p * cot * 4                      # fp32 accumulators
                + 2 * 16 * c * cot * itemsize          # u, dbl-buffered
                + 2 * 4 * p * cot * itemsize)          # out, dbl-buffered

    cot = co
    while True:
        for cand in range(min(n, 256), 0, -1):
            if n % cand == 0 and live_bytes(cand, cot) <= budget:
                return cand, cot
        if cot % 2 or cot <= 128:
            return 1, cot
        cot //= 2


def conv3x3_winograd_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                            batch_tile: Optional[int] = None,
                            interpret: Optional[bool] = None
                            ) -> jnp.ndarray:
    """Fused-VMEM Winograd F(2x2, 3x3): NHWC, stride 1, pad 1, HWIO."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, h, w, c = x.shape
    co = kernel.shape[3]
    xp, th, tw = _pad_for_tiles(x)

    tn, cot = _pick_tiles(n, th, tw, c, co, jnp.dtype(x.dtype).itemsize)
    if batch_tile is not None:
        tn = min(batch_tile, n)
        while n % tn:
            tn -= 1

    # even/odd phase split packed on the channel axis (stride-2 slices
    # stay in XLA; each phase has extent th+1 / tw+1 exactly)
    phases = jnp.concatenate([xp[:, pa::2, pb::2, :]
                              for pa in (0, 1) for pb in (0, 1)], axis=-1)

    u = transform_weights(kernel).astype(x.dtype).reshape(16, c, co)

    nj = co // cot
    y = pl.pallas_call(
        functools.partial(_winograd_kernel, th=th, tw=tw),
        grid=(n // tn, nj),
        in_specs=[
            pl.BlockSpec((tn, th + 1, tw + 1, 4 * c),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, c, cot), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, th, tw, 4 * cot),
                               lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, th, tw, 4 * co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 16 * n * th * tw * c * co,
            bytes_accessed=(phases.size + u.size + n * 4 * th * tw * co)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(phases, u)

    # de-interleave: channel layout is [cout-tile][phase 2i+j][cc]
    y = y.reshape(n, th, tw, nj, 2, 2, cot).transpose(0, 1, 4, 2, 5, 3, 6)
    y = y.reshape(n, 2 * th, 2 * tw, co)
    return y[:, :h, :w, :]
