"""Temporal Convolutional Network (dilated causal convs).

Mirrors /root/reference/models/temporal_convolutional_model.py:21-75 with a
feature-last (B, T, C) layout.  The whole stack is frame-causal: output at
frame t depends only on frames <= t, which is what makes right-padded
fixed-shape eval exact on TPU.
"""
from __future__ import annotations

from typing import Sequence

import jax
import flax.linen as nn

from fvt_tpu.models.layers import CausalWeightNormConv1d, Conv1d1x1


class TemporalBlock(nn.Module):
    n_outputs: int
    kernel_size: int
    dilation: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        n_inputs = x.shape[-1]

        net = CausalWeightNormConv1d(self.n_outputs, self.kernel_size,
                                     dilation=self.dilation, name='conv1')(x)
        net = jax.nn.leaky_relu(net, negative_slope=0.01)
        net = nn.Dropout(self.dropout, deterministic=not train)(net)
        net = CausalWeightNormConv1d(self.n_outputs, self.kernel_size,
                                     dilation=self.dilation, name='conv2')(net)
        net = jax.nn.leaky_relu(net, negative_slope=0.01)
        net = nn.Dropout(self.dropout, deterministic=not train)(net)

        if n_inputs != self.n_outputs:
            res = Conv1d1x1(self.n_outputs, name='downsample')(x)
        else:
            res = x
        return jax.nn.leaky_relu(net + res, negative_slope=0.01)


class TemporalConvNet(nn.Module):
    num_channels: Sequence[int]
    kernel_size: int = 2
    dropout: float = 0.2
    attention: int = 0
    max_length: int = 200

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i, ch in enumerate(self.num_channels):
            x = TemporalBlock(ch, self.kernel_size, dilation=2 ** i,
                              dropout=self.dropout, name=f'block{i}')(
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
