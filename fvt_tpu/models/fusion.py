"""Fusion modules: LFAN multimodal attention, CAN gating, JMT/MT fusion.

Faithful TPU re-expressions of /root/reference/models/transformer.py:102-215
and models/model.py:529-568, 716-750, 895-1048.  All activations are
feature-last (B, T, C); attention over padded timelines takes an optional
validity mask so fixed-shape eval matches the reference's ragged bs=1 eval.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from fvt_tpu.models.layers import (
    TorchLinear, TorchMultiheadAttention, scaled_dot_product,
    xavier_uniform_gain)


class MultimodalMultiheadAttention(nn.Module):
    """Per-(head, timestep) attention over the modality axis
    (transformer.py:102-165).  Frame-local: no time mixing."""
    modalities: Sequence[str]
    input_dim: Dict[str, int]
    modal_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray]):
        h = self.num_heads
        hd = self.modal_dim // h
        m = len(self.modalities)
        if self.input_dim:
            # validation only: flax infers the qkv in-features from the
            # data (torch sizes the Linears from this dict,
            # transformer.py:234)
            for modal in self.modalities:
                assert x[modal].shape[-1] == self.input_dim[modal], (
                    f"{modal}: feature dim {x[modal].shape[-1]} != "
                    f"input_dim {self.input_dim[modal]}")

        qs, ks, vs = [], [], []
        for modal in self.modalities:
            qkv = TorchLinear(3 * self.modal_dim, name=f'qkv_{modal}',
                              kernel_init=xavier_uniform_gain(1.0),
                              bias_init=nn.initializers.zeros)(x[modal])
            b, t, _ = qkv.shape
            qkv = qkv.reshape(b, t, h, 1, 3 * hd)   # modal slot axis
            qkv = qkv.transpose(0, 2, 1, 3, 4)       # (B, H, T, 1, 3hd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            qs.append(q)
            ks.append(k)
            vs.append(v)

        q = jnp.concatenate(qs, axis=-2)  # (B, H, T, M, hd)
        k = jnp.concatenate(ks, axis=-2)
        v = jnp.concatenate(vs, axis=-2)

        values, _ = scaled_dot_product(q, k, v)
        values = values + v                      # +V residual (line 157)
        values = values.transpose(0, 2, 1, 3, 4)  # (B, T, H, M, hd)
        b, t = values.shape[:2]
        values = values.reshape(b, t, self.modal_dim * m)
        return TorchLinear(self.modal_dim * m, name='o_proj',
                           kernel_init=xavier_uniform_gain(1.0),
                           bias_init=nn.initializers.zeros)(values)


class MultimodalTransformerEncoder(nn.Module):
    """One attention block + dropout + LayerNorm (transformer.py:168-215).

    The reference's ``qkv_proj.bias``/``o_proj.bias`` are zero-initialised
    (transformer.py:126-130); the attention block above passes
    ``bias_init=zeros`` so from-scratch init matches exactly.
    """
    modalities: Sequence[str]
    input_dim: Dict[str, int]
    modal_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray], *, train: bool = False):
        attn = MultimodalMultiheadAttention(
            self.modalities, self.input_dim, self.modal_dim,
            self.num_heads, name='self_attn')(x)
        out = nn.Dropout(self.dropout, deterministic=not train)(attn)
        return nn.LayerNorm(epsilon=1e-5, name='norm1')(out)


class AttentionFusion(nn.Module):
    """CAN gating fusion (model.py:529-568): per-modality projection to 128,
    softmax gate over the concatenated feature axis, elementwise product."""
    modalities: Sequence[str]
    num_out_feats: int = 128

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray]):
        proj = [TorchLinear(self.num_out_feats, name=f'attn_{i}')(x[m])
                for i, m in enumerate(self.modalities)]
        cat = jnp.concatenate(proj, axis=-1)
        weights = TorchLinear(cat.shape[-1], name='weights')(cat)
        attn = jax.nn.softmax(weights, axis=-1)
        return attn * cat


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (model.py:728-750)."""
    input_dim: int
    num_heads: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x, key_valid_mask=None):
        attn = TorchMultiheadAttention(self.input_dim, self.num_heads,
                                       name='attention')(
            x, x, x, key_valid_mask=key_valid_mask)
        x = nn.LayerNorm(epsilon=1e-5, name='layer_norm1')(x + attn)
        ff = TorchLinear(self.hidden_dim, name='ff1')(x)
        ff = jax.nn.relu(ff)
        ff = TorchLinear(self.input_dim, name='ff2')(ff)
        return nn.LayerNorm(epsilon=1e-5, name='layer_norm2')(x + ff)


class TransformerEncoderBlock(nn.Module):
    input_dim: int
    num_heads: int
    hidden_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x, key_valid_mask=None):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.input_dim, self.num_heads, self.hidden_dim,
                name=f'layer{i}')(x, key_valid_mask=key_valid_mask)
        return x


class _JointFusionBase(nn.Module):
    """Shared machinery of JMT/MT fusion (model.py:895-1048).

    Inputs: ``visual`` (B, T, 128), ``audio`` (B, T, 64); optional
    ``time_mask`` (B, T) of valid frames.  The reference's final
    self-attention runs over the flattened (T*B) axis with the stacked
    cross-attention outputs as "batch" — reproduced exactly (including the
    cross-sample mixing it implies for B > 1; the reference only evaluates
    it at B = 1).
    """
    joint: bool = True

    @nn.compact
    def __call__(self, visual, audio, time_mask=None):
        b, t, _ = visual.shape
        audio = TorchLinear(128, name='augment_audio')(audio)

        enc_v = TransformerEncoderBlock(128, 1, 128, 1,
                                        name='visual_encoder')(
            visual, key_valid_mask=time_mask)
        enc_a = TransformerEncoderBlock(128, 1, 128, 1,
                                        name='audio_encoder')(
            audio, key_valid_mask=time_mask)

        ca = TorchMultiheadAttention
        ca_va = ca(128, 1, name='CA_va')(enc_v, enc_a, enc_a,
                                         key_valid_mask=time_mask)
        ca_av = ca(128, 1, name='CA_av')(enc_a, enc_v, enc_v,
                                         key_valid_mask=time_mask)
        stack = [ca_va, ca_av]

        if self.joint:
            jr = TorchLinear(128, name='reduce_feats')(
                jnp.concatenate([visual, audio], axis=-1))
            enc_jr = TransformerEncoderBlock(128, 1, 128, 1,
                                             name='jr_encoder')(
                jr, key_valid_mask=time_mask)
            ca_jrv = ca(128, 1, name='CA_jrv')(enc_jr, enc_v, enc_v,
                                               key_valid_mask=time_mask)
            ca_vjr = ca(128, 1, name='CA_vjr')(enc_v, enc_jr, enc_jr,
                                               key_valid_mask=time_mask)
            ca_jra = ca(128, 1, name='CA_jra')(enc_jr, enc_a, enc_a,
                                               key_valid_mask=time_mask)
            ca_ajr = ca(128, 1, name='CA_ajr')(enc_a, enc_jr, enc_jr,
                                               key_valid_mask=time_mask)
            stack = [ca_va, ca_av, ca_jrv, ca_vjr, ca_jra, ca_ajr]

        n_stack = len(stack)
        # (n_stack, B*T, 128): slots as batch, flattened timeline as sequence
        # (reference views (T, B, n, C) -> (T*B, n, C) with seq = T*B).
        s = jnp.stack(stack, axis=0).reshape(n_stack, b * t, 128)
        flat_mask = (time_mask.reshape(1, b * t).repeat(n_stack, axis=0)
                     if time_mask is not None else None)

        s = TransformerEncoderBlock(128, 1, 128, 1, name='final_encoder')(
            s, key_valid_mask=flat_mask)
        s = TorchMultiheadAttention(128, 1, name='final_self_attention')(
            s, s, s, key_valid_mask=flat_mask)

        out = s.reshape(n_stack, b, t, 128)[-1]  # last stack slot
        return out


class JMTFusion(_JointFusionBase):
    joint: bool = True


class MTFusion(_JointFusionBase):
    joint: bool = False
