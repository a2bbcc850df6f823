"""PyTorch state_dict -> fvt_tpu param-tree converters.

Lets reference-trained checkpoints (LFAN/CAN/JMT/MT ``model.pt``, ArcFace
``res50_ir_0.887.pth``, VGGish ``vggish.pth``) run unchanged on TPU.  The
layout conversions:

  * Linear  (out, in)            -> kernel (in, out)
  * Conv1d  (out, in, k)         -> WIO (k, in, out)
  * Conv2d  (out, in, kh, kw)    -> HWIO (kh, kw, in, out)
  * weight-norm conv1d: weight_v (out, in, k) -> v (k, in, out),
    weight_g (out, 1, 1) -> g (out,)
  * BatchNorm: weight/bias -> scale/bias (params);
    running_mean/var -> mean/var (batch_stats)
  * nn.MultiheadAttention: in_proj_weight (3E, E) -> in_proj_kernel (E, 3E)

State dicts are expected as numpy-convertible mappings (torch tensors or
numpy arrays keyed by the reference module names).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, 'detach'):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def linear(sd: dict, prefix: str) -> dict:
    out = {'kernel': _np(sd[f'{prefix}.weight']).T}
    if f'{prefix}.bias' in sd:
        out['bias'] = _np(sd[f'{prefix}.bias'])
    return {'dense': out}


def mha(sd: dict, prefix: str) -> dict:
    return {
        'in_proj_kernel': _np(sd[f'{prefix}.in_proj_weight']).T,
        'in_proj_bias': _np(sd[f'{prefix}.in_proj_bias']),
        'out_proj': linear(sd, f'{prefix}.out_proj'),
    }


def layernorm(sd: dict, prefix: str) -> dict:
    return {'scale': _np(sd[f'{prefix}.weight']),
            'bias': _np(sd[f'{prefix}.bias'])}


def batchnorm(sd: dict, prefix: str) -> Tuple[dict, dict]:
    params = {'scale': _np(sd[f'{prefix}.weight']),
              'bias': _np(sd[f'{prefix}.bias'])}
    stats = {'mean': _np(sd[f'{prefix}.running_mean']),
             'var': _np(sd[f'{prefix}.running_var'])}
    return {'bn': params}, {'bn': stats}


def wn_conv1d(sd: dict, prefix: str) -> dict:
    # torch >= 2.1 parametrize naming vs legacy weight_g/weight_v
    if f'{prefix}.weight_v' in sd:
        v = _np(sd[f'{prefix}.weight_v'])
        g = _np(sd[f'{prefix}.weight_g'])
    else:
        v = _np(sd[f'{prefix}.parametrizations.weight.original1'])
        g = _np(sd[f'{prefix}.parametrizations.weight.original0'])
    return {'v': v.transpose(2, 1, 0), 'g': g.reshape(-1),
            'bias': _np(sd[f'{prefix}.bias'])}


def conv1d_1x1(sd: dict, prefix: str) -> dict:
    w = _np(sd[f'{prefix}.weight'])  # (out, in, 1)
    return {'proj': {'dense': {'kernel': w[:, :, 0].T,
                               'bias': _np(sd[f'{prefix}.bias'])}}}


def tcn(sd: dict, prefix: str, num_channels: Sequence[int], input_dim: int
        ) -> dict:
    """TemporalConvNet: network.{i}.{conv1,conv2,downsample}."""
    params = {}
    in_ch = input_dim
    for i, out_ch in enumerate(num_channels):
        blk = {
            'conv1': wn_conv1d(sd, f'{prefix}.network.{i}.conv1'),
            'conv2': wn_conv1d(sd, f'{prefix}.network.{i}.conv2'),
        }
        if in_ch != out_ch:
            blk['downsample'] = conv1d_1x1(
                sd, f'{prefix}.network.{i}.downsample')
        params[f'block{i}'] = blk
        in_ch = out_ch
    return params


def encoder_layer(sd: dict, prefix: str) -> dict:
    """Reference TransformerEncoderLayer (model.py:728-750)."""
    return {
        'attention': mha(sd, f'{prefix}.attention'),
        'ff1': linear(sd, f'{prefix}.feed_forward.0'),
        'ff2': linear(sd, f'{prefix}.feed_forward.2'),
        'layer_norm1': layernorm(sd, f'{prefix}.layer_norm1'),
        'layer_norm2': layernorm(sd, f'{prefix}.layer_norm2'),
    }


def encoder_block(sd: dict, prefix: str, num_layers: int = 1) -> dict:
    return {f'layer{i}': encoder_layer(sd, f'{prefix}.layers.{i}')
            for i in range(num_layers)}


def spatial_from_torch(sd: dict) -> Tuple[dict, dict]:
    """Port the frozen spatial backbones EMBEDDED in a fusion-model
    checkpoint (keys 'spatial.visual.backbone.*' for the ArcFace ResNet,
    'spatial.audio.backbone.*' for VGGish — model.py:455-463).

    Returns (params, batch_stats) with 'spatial_video'/'spatial_audio'
    roots matching the fvt_tpu model trees; empty when absent.
    """
    params: dict = {}
    stats: dict = {}
    if any(k.startswith('spatial.visual.') for k in sd):
        from fvt_tpu.models.arcface import visual_backbone_from_torch
        sub = {k[len('spatial.visual.'):]: v for k, v in sd.items()
               if k.startswith('spatial.visual.')}
        p, s = visual_backbone_from_torch(sub)
        params['spatial_video'] = p
        stats['spatial_video'] = s
    if any(k.startswith('spatial.audio.') for k in sd):
        from fvt_tpu.models.vggish import vggish_from_torch
        sub = {k[len('spatial.audio.backbone.'):]: v for k, v in sd.items()
               if k.startswith('spatial.audio.backbone.')}
        params['spatial_audio'] = vggish_from_torch(sub)
    return params, stats


def lfan_from_torch(sd: dict, modality: Sequence[str],
                    tcn_channel: Dict[str, Sequence[int]],
                    embedding_dim: Dict[str, int]) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) for fvt_tpu LFAN (spatial excluded)."""
    params: dict = {}
    stats: dict = {}
    for modal in modality:
        params[f'temporal_{modal}'] = tcn(
            sd, f'temporal.{modal}', tcn_channel[modal],
            embedding_dim[modal])
        p, s = batchnorm(sd, f'bn.{modal}')
        params[f'bn_{modal}'] = p
        stats[f'bn_{modal}'] = s

    attn = {}
    for modal in modality:
        attn[f'qkv_{modal}'] = linear(
            sd, f'fusion.layers.self_attn.qkv_proj.{modal}')
    attn['o_proj'] = linear(sd, 'fusion.layers.self_attn.o_proj')
    params['fusion'] = {
        'self_attn': attn,
        'norm1': layernorm(sd, 'fusion.layers.norm1'),
    }
    params['regressor'] = linear(sd, 'regressor')
    return params, stats


def can_from_torch(sd: dict, modality: Sequence[str],
                   tcn_settings: Dict[str, dict]) -> Tuple[dict, dict]:
    params: dict = {}
    stats: dict = {}
    for modal in modality:
        params[f'temporal_{modal}'] = tcn(
            sd, f'temporal.{modal}', tcn_settings[modal]['channel'],
            tcn_settings[modal]['input_dim'])
        p, s = batchnorm(sd, f'bn.{modal}')
        params[f'bn_{modal}'] = p
        stats[f'bn_{modal}'] = s

    fuse = {f'attn_{i}': linear(sd, f'fuse.attn.{i}')
            for i in range(len(modality))}
    fuse['weights'] = linear(sd, 'fuse.weights')
    params['fuse'] = fuse

    params['fc1'] = linear(sd, 'fc1')
    p, s = batchnorm(sd, 'bn1')
    params['bn1'] = p
    stats['bn1'] = s
    params['fc2'] = linear(sd, 'fc2')
    return params, stats


def jmt_from_torch(sd: dict, modality: Sequence[str],
                   tcn_settings: Dict[str, dict],
                   joint: bool = True) -> Tuple[dict, dict]:
    params: dict = {}
    stats: dict = {}
    for modal in modality:
        params[f'temporal_{modal}'] = tcn(
            sd, f'temporal.{modal}', tcn_settings[modal]['channel'],
            tcn_settings[modal]['input_dim'])
        p, s = batchnorm(sd, f'bn.{modal}')
        params[f'bn_{modal}'] = p
        stats[f'bn_{modal}'] = s

    fuse = {
        'augment_audio': linear(sd, 'fuse.augment_audio_feats_dim'),
        'visual_encoder': encoder_block(sd, 'fuse.visual_encoder'),
        'audio_encoder': encoder_block(sd, 'fuse.audio_encoder'),
        'CA_va': mha(sd, 'fuse.CA_va'),
        'CA_av': mha(sd, 'fuse.CA_av'),
        'final_encoder': encoder_block(sd, 'fuse.final_encoder'),
        'final_self_attention': mha(sd, 'fuse.final_self_attention'),
    }
    if joint:
        fuse.update({
            'reduce_feats': linear(sd, 'fuse.reduce_feats_dim'),
            'jr_encoder': encoder_block(sd, 'fuse.jr_encoder'),
            'CA_jrv': mha(sd, 'fuse.CA_jrv'),
            'CA_vjr': mha(sd, 'fuse.CA_vjr'),
            'CA_jra': mha(sd, 'fuse.CA_jra'),
            'CA_ajr': mha(sd, 'fuse.CA_ajr'),
        })
    params['fuse'] = fuse

    params['fc1'] = linear(sd, 'fc1')
    p, s = batchnorm(sd, 'bn1')
    params['bn1'] = p
    stats['bn1'] = s
    params['fc2'] = linear(sd, 'fc2')
    return params, stats
