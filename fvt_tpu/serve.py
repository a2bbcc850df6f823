"""Serving-optimized LFAN forward (Pallas TCN path).

Builds an inference function over a trained LFAN variable tree that runs
the per-modality TCNs through the fused Pallas temporal-block kernel
(ops/tcn_pallas) instead of the layer-by-layer XLA path, with eval-mode
BatchNorm folded to a scale/shift.  Numerically equivalent to
``model.apply(..., train=False)`` (same params, same math) — verified in
tests/test_serving.py.

Usage:
    serve_fn = build_lfan_serving_fn(model, variables)
    logits = serve_fn(batch)          # jitted, (B, T, C)
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from fvt_tpu import constants
from fvt_tpu.config import model_config as MC
from fvt_tpu.ops.tcn_pallas import tcn_forward_pallas
from fvt_tpu.train.steps import _device_transform


def _bn_eval(x, params, stats, eps=1e-5):
    scale = params['bn']['scale']
    bias = params['bn']['bias']
    mean = stats['bn']['mean']
    var = stats['bn']['var']
    inv = scale / jnp.sqrt(var + eps)
    return x * inv + (bias - mean * inv)


def build_lfan_serving_step(model, interpret: Optional[bool] = None):
    """Returns a jitted fn(params, batch_stats, batch) -> (B, T, C) logits
    usable with a live (changing) train state — same signature as the
    unmasked eval step from fvt_tpu.train.steps."""
    modality = list(model.modality)
    tcn_channel = model.tcn_channel or MC.TCN_CHANNELS
    leader = modality[0]

    def forward(params, stats, batch: Dict[str, jnp.ndarray],
                length=None):
        x = _device_transform(batch, train=False)

        # frozen spatial encoders (same flax submodules)
        if 'video' in x and x['video'].ndim == 5 \
                and model.spatial_video is not None:
            b, t = x['video'].shape[:2]
            frames = x['video'].reshape((b * t,) + x['video'].shape[2:])
            feats = model.spatial_video.apply(
                {'params': params['spatial_video'],
                 'batch_stats': stats.get('spatial_video', {})},
                frames, train=False)
            x = dict(x)
            x['video'] = feats.reshape(b, t, -1)
        if 'logmel' in x and x['logmel'].ndim == 4 \
                and model.spatial_audio is not None:
            # raw log-mel patches go through VGGish exactly as in
            # models._maybe_encode_spatial — feeding them straight to the
            # TCN kernel would be a shape/semantics error
            b, t = x['logmel'].shape[:2]
            patches = x['logmel'].reshape((b * t,) + x['logmel'].shape[2:])
            feats = model.spatial_audio.apply(
                {'params': params['spatial_audio'],
                 'batch_stats': stats.get('spatial_audio', {})},
                patches, train=False)
            x = dict(x)
            x['logmel'] = feats.reshape(b, t, -1)

        feats = {}
        for modal in modality:
            h = tcn_forward_pallas(
                x[modal], params[f'temporal_{modal}'],
                tcn_channel[modal], kernel_size=model.kernel_size,
                interpret=interpret)
            feats[modal] = _bn_eval(h, params[f'bn_{modal}'],
                                    stats[f'bn_{modal}'])

        from fvt_tpu.ops.fusion_pallas import fused_multimodal_fusion
        follower = fused_multimodal_fusion(
            feats, params['fusion'], tuple(modality), model.modal_dim,
            model.num_heads, interpret=interpret)
        out = jnp.concatenate([feats[leader], follower], axis=-1)
        k = params['regressor']['dense']
        out = out @ k['kernel'] + k['bias']
        if model.task == constants.REGRESSION:
            out = jnp.tanh(out)
        return out

    return jax.jit(forward)


def build_lfan_serving_fn(model, variables: dict,
                          interpret: Optional[bool] = None):
    """Convenience wrapper over a fixed variable tree:
    fn(batch) -> logits."""
    step = build_lfan_serving_step(model, interpret=interpret)
    params = variables['params']
    stats = variables.get('batch_stats', {})
    return lambda batch: step(params, stats, batch)
