"""Remaining fusion variants from the reference model zoo.

Ports of /root/reference/models/transformer.py:50-99 (gated multi-head
attention), :218-404 (Intra/Inter-modal transformer encoders) and
models/temporal_convolutional_model.py:78-115 (TCN AttentionBlock) — not
used by the live LFAN path but part of the reference API surface; the
AttentionBlock reproduces the reference's (idiosyncratic) softmax over the
query axis and causal triu mask, without its hard-coded .cuda().
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from fvt_tpu.models.layers import TorchLinear, xavier_uniform_gain
from fvt_tpu.models.fusion import MultimodalMultiheadAttention


class GatedMultiheadAttention(nn.Module):
    """transformer.py:50-99: packed qkv with optional multiplicative gate
    on q/k (the gate broadcasts over the sequence)."""
    input_dim: int
    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, gate: Optional[jnp.ndarray] = None):
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        b, t, _ = x.shape

        # reference zero-fills qkv/o biases (transformer.py:67-71)
        qkv = TorchLinear(3 * e, name='qkv_proj',
                          kernel_init=xavier_uniform_gain(1.0),
                          bias_init=nn.initializers.zeros)(x)
        qkv = qkv.reshape(b, t, h, 3 * hd).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if gate is not None:
            g = gate[:, None, None, :]  # (B, 1, 1, hd)
            q = q * g
            k = k * g

        logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(logits, axis=-1)
        values = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        values = values.transpose(0, 2, 1, 3).reshape(b, t, e)
        return TorchLinear(e, name='o_proj',
                           kernel_init=xavier_uniform_gain(1.0),
                           bias_init=nn.initializers.zeros)(values)


class IntraEncoderBlock(nn.Module):
    """Pre-LN-free post-norm block with residuals (transformer.py:284-323)."""
    input_dim: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, gate=None, *, train: bool = False):
        attn = GatedMultiheadAttention(self.input_dim, self.input_dim,
                                       self.num_heads,
                                       name='self_attn')(x, gate=gate)
        x = nn.LayerNorm(epsilon=1e-5, name='norm1')(
            x + nn.Dropout(self.dropout, deterministic=not train)(attn))
        ff = TorchLinear(self.dim_feedforward, name='ff1')(x)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = jax.nn.relu(ff)
        ff = TorchLinear(self.input_dim, name='ff2')(ff)
        x = nn.LayerNorm(epsilon=1e-5, name='norm2')(
            x + nn.Dropout(self.dropout, deterministic=not train)(ff))
        return x


class IntraModalTransformerEncoder(nn.Module):
    """Stack of IntraEncoderBlocks (transformer.py:370-387)."""
    num_layers: int
    input_dim: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, gate=None, *, train: bool = False):
        for i in range(self.num_layers):
            x = IntraEncoderBlock(self.input_dim, self.num_heads,
                                  self.dim_feedforward, self.dropout,
                                  name=f'layer{i}')(x, gate=gate,
                                                    train=train)
        return x


class InterModalTransformerEncoder(nn.Module):
    """Per-frame modality attention + MLP head (transformer.py:326-404;
    the attention math is identical to the LFAN fusion's)."""
    modalities: Sequence[str]
    input_dim: Dict[str, int]
    modal_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray], *, train: bool = False):
        out_dim = self.modal_dim * len(self.modalities)
        attn = MultimodalMultiheadAttention(
            tuple(self.modalities), dict(self.input_dim), self.modal_dim,
            self.num_heads, name='self_attn')(x)
        h = nn.Dropout(self.dropout, deterministic=not train)(attn)
        h = nn.LayerNorm(epsilon=1e-5, name='norm1')(h)
        ff = TorchLinear(out_dim, name='ff1')(h)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = jax.nn.relu(ff)
        ff = TorchLinear(out_dim, name='ff2')(ff)
        return nn.LayerNorm(epsilon=1e-5, name='norm2')(ff)


class TCNAttentionBlock(nn.Module):
    """temporal_convolutional_model.py:78-115, faithfully including the
    softmax over the QUERY axis (dim=1 of (B, Tq, Tk)) and the causal
    upper-triangular mask; device-agnostic (no .cuda())."""
    k_size: int
    v_size: int

    @nn.compact
    def __call__(self, minibatch):
        b, t, d = minibatch.shape
        keys = TorchLinear(self.k_size, name='key_layer')(minibatch)
        queries = TorchLinear(self.k_size, name='query_layer')(minibatch)
        values = TorchLinear(self.v_size, name='value_layer')(minibatch)

        logits = jnp.einsum('btk,bsk->bts', queries, keys)
        mask = jnp.triu(jnp.ones((t, t), bool), k=1)
        logits = jnp.where(mask[None], -jnp.inf, logits)
        probs = jax.nn.softmax(logits, axis=1) / math.sqrt(self.k_size)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)  # fully-masked cols
        read = jnp.einsum('bts,bsv->btv', probs, values)
        return minibatch + read
