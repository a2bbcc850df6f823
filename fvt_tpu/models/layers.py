"""Shared flax building blocks with torch-compatible semantics.

These layers reproduce the numerical behavior of the reference's torch
modules (so ported weights give identical outputs) while using TPU-friendly
layouts: activations are kept feature-last ``(B, T, C)`` end-to-end and
conv kernels are stored ``(K, C_in, C_out)`` for
``lax.conv_general_dilated`` with NWC/WIO dimension numbers.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


# ------------------------------------------------------------------ inits
def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    shape is flax layout (in_features, out_features).
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_from_fan_in(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_gain(gain: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        # flax dense/conv kernels: (..., in, out); xavier uses the last two
        fan_in = math.prod(shape[:-1])
        fan_out = shape[-1]
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -a, a)

    return init


def materialize_weight_norm(v: jnp.ndarray, g: jnp.ndarray
                            ) -> jnp.ndarray:
    """g * v / ||v|| per output channel (torch weight_norm) — the ONE
    definition shared by the flax train path and the Pallas serving
    path, so the clamp/norm axes cannot drift apart."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    return v * (g[None, None, :] / jnp.maximum(norm, 1e-12))


class TorchLinear(nn.Module):
    """nn.Dense with torch's default init (matters for from-scratch runs)."""
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_kernel_init
        bias_init = (self.bias_init
                     or torch_bias_init_from_fan_in(in_features))
        dense = nn.Dense(self.features, use_bias=self.use_bias,
                         kernel_init=kernel_init,
                         bias_init=bias_init,
                         name='dense')
        return dense(x)


class _TorchBNCore(nn.Module):
    """The actual norm, named 'bn' so the param/stat tree matches the
    earlier nn.BatchNorm wrapper and the torch-port converters.

    Differences vs flax nn.BatchNorm, matching torch BatchNorm1d:
    normalization uses the BIASED batch variance, but the running_var
    EMA accumulates the UNBIASED (n/(n-1)) estimator
    (torch/nn/modules/batchnorm.py) — flax stores the biased one, which
    drifts train-path running stats from the reference.

    Stats are computed in at-least-float32 (bf16 activations upcast;
    float64 activations — e.g. the x64 lockstep-equivalence twin,
    tools/twin_train.py — keep full precision rather than being silently
    truncated to float32, which showed up as a systematic ~1e-6
    activation delta vs torch under jax_enable_x64)."""
    use_running_average: bool
    momentum_torch: float
    eps: float

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            n = 1
            for d in red:
                n *= x.shape[d]
            xf = x.astype(stat_dtype)
            mean = jnp.mean(xf, axis=red)
            var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum_torch
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1.0 - m) * ra_mean.value
                                 + m * mean).astype(ra_mean.value.dtype)
                ra_var.value = ((1.0 - m) * ra_var.value
                                + m * unbiased).astype(ra_var.value.dtype)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x.astype(stat_dtype) - mean) * inv + bias).astype(x.dtype)


class TorchEMABatchNorm(nn.Module):
    """Drop-in for ``flax.linen.BatchNorm`` at explicitly-NAMED call
    sites (the param/stat tree is unchanged, so existing checkpoints and
    the torch-port converters load as-is) with ONE difference: the
    running_var EMA accumulates torch's UNBIASED (n/(n-1)) estimator
    (torch/nn/modules/batchnorm.py), where flax accumulates the biased
    one.  Used by the ArcFace backbone, whose frozen-but-TRAIN-mode
    contract (reference model.py:432-433 + model.train()) updates
    running stats every training step — with flax BN those stats drift
    from a reference run by the n/(n-1) factor and the drift is baked
    into checkpoints and reverse exports.

    Eval math matches flax exactly: cast to ``dtype``, normalize with
    the running stats.  Train-mode normalization uses the biased batch
    variance, like both torch and flax; batch stats are computed in
    at-least-float32 like flax's ``_compute_stats``.
    ``momentum`` keeps the flax convention (torch momentum = 1 - it)."""
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            n = 1
            for d in red:
                n *= x.shape[d]
            xf = x.astype(stat_dtype)
            mean = jnp.mean(xf, axis=red)
            var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
            if not self.is_initializing():
                m = 1.0 - self.momentum  # torch momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1.0 - m) * ra_mean.value
                                 + m * mean).astype(ra_mean.value.dtype)
                ra_var.value = ((1.0 - m) * ra_var.value
                                + m * unbiased).astype(ra_var.value.dtype)
        # normalize in `dtype` like flax (promotion of x/params if None)
        d = self.dtype if self.dtype is not None else stat_dtype
        inv = (jax.lax.rsqrt(var.astype(d) + jnp.asarray(self.epsilon, d))
               * scale.astype(d))
        return (x.astype(d) - mean.astype(d)) * inv + bias.astype(d)


class TorchBatchNorm(nn.Module):
    """BatchNorm over all-but-last axis; torch eps/momentum defaults.

    Equivalent to torch BatchNorm1d applied per-channel over (B, T) when the
    input is (B, T, C).  ``use_running_average=True`` for eval.
    """
    use_running_average: bool = False
    momentum_torch: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return _TorchBNCore(self.use_running_average, self.momentum_torch,
                            self.eps, name='bn')(x)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(C), init 0.25), feature-last.

    alpha is stored fp32 but applied in the activation dtype — otherwise
    a bf16 backbone pays a full-activation upcast at every PReLU."""
    channels: int
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            'alpha', lambda key, shape: jnp.full(shape, self.init_value),
            (self.channels,))
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


class CausalWeightNormConv1d(nn.Module):
    """Causal dilated conv1d with weight normalisation.

    Reference semantics: pad both sides by ``(k-1)*dilation`` then chomp the
    right (temporal_convolutional_model.py:12-37) == left-pad only + VALID.
    Weight norm over (K, C_in) per output channel (torch dim=0 on OIW).
    Input/output: (B, T, C) feature-last.
    """
    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, materialize_only: bool = False):
        """materialize_only=True declares the same params but returns
        (kernel, bias) instead of convolving — used by the fused Pallas
        train path, which runs the conv inside its own kernel."""
        in_features = x.shape[-1]
        k = self.kernel_size

        def v_init(key, shape, dtype=jnp.float32):
            # torch conv default kaiming-uniform(a=sqrt(5)) on fan_in=C_in*K
            fan_in = shape[0] * shape[1]
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        v = self.param('v', v_init, (k, in_features, self.features))
        g = self.param(
            'g',
            lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, self.features), axis=0),
            (self.features,))

        kernel = materialize_weight_norm(v, g)

        b = None
        if self.use_bias:
            fan_in = in_features * k
            b = self.param('bias', torch_bias_init_from_fan_in(fan_in),
                           (self.features,))
        if materialize_only:
            return kernel, b

        pad = (k - 1) * self.dilation
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1,),
            padding=[(pad, 0)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=('NWC', 'WIO', 'NWC'))
        if b is not None:
            y = y + b
        return y


class Conv1d1x1(nn.Module):
    """Pointwise conv1d (the TCN residual downsample), feature-last."""
    features: int
    kernel_init: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        kw = {}
        if self.kernel_init is not None:
            kw['kernel_init'] = self.kernel_init
        return TorchLinear(self.features, name='proj', **kw)(x)


def scaled_dot_product(q, k, v):
    """softmax(q k^T / sqrt(d)) v over the last two axes
    (reference models/transformer.py:11-19)."""
    d_k = q.shape[-1]
    attn_logits = jnp.einsum('...qd,...kd->...qk', q, k) / math.sqrt(d_k)
    attention = jax.nn.softmax(attn_logits, axis=-1)
    values = jnp.einsum('...qk,...kd->...qd', attention, v)
    return values, attention


class TorchMultiheadAttention(nn.Module):
    """Equivalent of torch nn.MultiheadAttention (self- or cross-attention).

    Packed qkv projection (in_proj (E, 3E) kernel = torch in_proj_weight^T),
    identical head split and scaling.  Inputs are (B, L, E) batch-first;
    an optional boolean mask (B, L_k) marks VALID key positions.
    """
    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, query, key, value, key_valid_mask=None):
        e, h = self.embed_dim, self.num_heads
        assert e % h == 0
        hd = e // h

        in_proj = self.param('in_proj_kernel', xavier_uniform_gain(1.0),
                             (e, 3 * e))
        in_bias = self.param('in_proj_bias', nn.initializers.zeros, (3 * e,))

        q = query @ in_proj[:, :e] + in_bias[:e]
        k = key @ in_proj[:, e:2 * e] + in_bias[e:2 * e]
        v = value @ in_proj[:, 2 * e:] + in_bias[2 * e:]

        def split(x):  # (B, L, E) -> (B, H, L, hd)
            b, l, _ = x.shape
            return x.reshape(b, l, h, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) / math.sqrt(hd)
        if key_valid_mask is not None:
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(key_valid_mask[:, None, None, :], logits, neg)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        b, _, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, e)

        # torch MHA._reset_parameters: out_proj KERNEL keeps the Linear
        # kaiming-uniform default; out_proj BIAS is zero-initialized
        out = TorchLinear(e, name='out_proj',
                          bias_init=nn.initializers.zeros)(out)
        return out


class PositionalEncoding(nn.Module):
    """Sin/cos positional encoding (transformer.py:22-47)."""
    d_model: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, x):
        position = jnp.arange(self.max_len, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(
            jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
            * (-math.log(10000.0) / self.d_model))
        pe = jnp.zeros((self.max_len, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
        return x + pe[None, :x.shape[1]]
