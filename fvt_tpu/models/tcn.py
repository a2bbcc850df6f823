"""Temporal Convolutional Network (dilated causal convs).

Mirrors /root/reference/models/temporal_convolutional_model.py:21-75 with a
feature-last (B, T, C) layout.  The whole stack is frame-causal: output at
frame t depends only on frames <= t, which is what makes right-padded
fixed-shape eval exact on TPU.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from fvt_tpu.models.layers import CausalWeightNormConv1d, Conv1d1x1


class TemporalBlock(nn.Module):
    n_outputs: int
    kernel_size: int
    dilation: int
    dropout: float = 0.2
    fused: bool = False  # fused Pallas kernel (fwd + custom-VJP bwd)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        n_inputs = x.shape[-1]
        conv1 = CausalWeightNormConv1d(self.n_outputs, self.kernel_size,
                                       dilation=self.dilation, name='conv1')
        conv2 = CausalWeightNormConv1d(self.n_outputs, self.kernel_size,
                                       dilation=self.dilation, name='conv2')

        if self.fused:
            # identical params/math in one VMEM-resident kernel; dropout
            # masks drawn here from the module's rng (a different —
            # equally valid — stream than flax Dropout's)
            from fvt_tpu.ops.tcn_pallas import fused_temporal_block_train
            w1, b1 = conv1(x, materialize_only=True)
            # conv2 consumes the (.., n_outputs) hidden stream; only the
            # last-dim shape matters for param declaration
            h_shape = jnp.zeros(x.shape[:2] + (self.n_outputs,), x.dtype)
            w2, b2 = conv2(h_shape, materialize_only=True)
            if n_inputs != self.n_outputs:
                from fvt_tpu.models.layers import xavier_uniform_gain
                res = Conv1d1x1(
                    self.n_outputs, name='downsample',
                    kernel_init=xavier_uniform_gain(2.0 ** 0.5))(x)
            else:
                res = x
            shape = x.shape[:2] + (self.n_outputs,)
            if train and self.dropout > 0.0:
                keep = 1.0 - self.dropout
                k1, k2 = jax.random.split(self.make_rng('dropout'))
                m1 = jax.random.bernoulli(k1, keep, shape) / keep
                m2 = jax.random.bernoulli(k2, keep, shape) / keep
                m1 = m1.astype(x.dtype)
                m2 = m2.astype(x.dtype)
            else:
                m1 = m2 = jnp.ones(shape, x.dtype)
            return fused_temporal_block_train(
                x, w1, b1, w2, b2, m1, m2, res,
                kernel_size=self.kernel_size, dilation=self.dilation)

        net = conv1(x)
        net = jax.nn.leaky_relu(net, negative_slope=0.01)
        net = nn.Dropout(self.dropout, deterministic=not train)(net)
        net = conv2(net)
        net = jax.nn.leaky_relu(net, negative_slope=0.01)
        net = nn.Dropout(self.dropout, deterministic=not train)(net)

        if n_inputs != self.n_outputs:
            # reference init_weights applies xavier_uniform(gain=sqrt(2))
            # to the plain downsample conv too
            # (temporal_convolutional_model.py:49)
            from fvt_tpu.models.layers import xavier_uniform_gain
            res = Conv1d1x1(self.n_outputs, name='downsample',
                            kernel_init=xavier_uniform_gain(2.0 ** 0.5))(x)
        else:
            res = x
        return jax.nn.leaky_relu(net + res, negative_slope=0.01)


class TemporalConvNet(nn.Module):
    num_channels: Sequence[int]
    kernel_size: int = 2
    dropout: float = 0.2
    attention: int = 0
    max_length: int = 200
    fused: bool = False  # route blocks through the fused Pallas kernel

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i, ch in enumerate(self.num_channels):
            x = TemporalBlock(ch, self.kernel_size, dilation=2 ** i,
                              dropout=self.dropout, fused=self.fused,
                              name=f'block{i}')(
                                  x, train=train)
            if self.attention == 1:
                # reference interleaves AttentionBlock(max_length^3) after
                # every temporal block, applied on the torch (B, C, T)
                # layout — i.e. attention over CHANNELS with time as the
                # feature axis (temporal_convolutional_model.py:69-70);
                # reproduced by transposing around the block
                from fvt_tpu.models.fusion_extra import TCNAttentionBlock
                xt = x.transpose(0, 2, 1)
                xt = TCNAttentionBlock(self.max_length, self.max_length,
                                       name=f'attn{i}')(xt)
                x = xt.transpose(0, 2, 1)
        return x
