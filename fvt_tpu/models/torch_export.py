"""fvt_tpu param-tree -> PyTorch state_dict exporters (inverse of
:mod:`fvt_tpu.models.torch_port`).

Lets TPU-trained fusion models (LFAN/CAN/JMT/MT) deploy back into the
reference stack: the exported mapping loads via
``model.load_state_dict(sd, strict=True)`` on the reference model classes
(/root/reference/experiment.py:242-247) and reproduces fvt_tpu's
per-frame logits (tools/twin_train.py pins this end to end).

Layout conversions (each the exact inverse of torch_port):

  * kernel (in, out)            -> Linear weight (out, in)
  * WIO (k, in, out)            -> Conv1d weight (out, in, k)
  * HWIO (kh, kw, in, out)      -> Conv2d weight (out, in, kh, kw)
  * weight-norm conv1d: v (k, in, out) -> weight_v (out, in, k),
    g (out,) -> weight_g (out, 1, 1)
  * BatchNorm: scale/bias -> weight/bias; mean/var (batch_stats) ->
    running_mean/running_var (fvt stores torch's UNBIASED running_var,
    so the inverse is the identity); num_batches_tracked is synthesized
    as 0 — torch only consumes it when BN momentum is None, and the
    reference always passes the default momentum.

Weight-norm key naming follows whatever convention the given torch
version's ``nn.utils.weight_norm`` registers (legacy ``weight_g``/
``weight_v`` vs ``parametrizations.weight.original{0,1}``) — pass
``legacy_wn=False`` for the parametrize naming.

All values are float32 numpy arrays; callers convert with
``{k: torch.from_numpy(v) for ...}`` (num_batches_tracked stays int64).
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def linear(tree: dict, prefix: str, out: dict) -> None:
    d = tree['dense']
    out[f'{prefix}.weight'] = _np(d['kernel']).T
    if 'bias' in d:
        out[f'{prefix}.bias'] = _np(d['bias'])


def mha(tree: dict, prefix: str, out: dict) -> None:
    out[f'{prefix}.in_proj_weight'] = _np(tree['in_proj_kernel']).T
    out[f'{prefix}.in_proj_bias'] = _np(tree['in_proj_bias'])
    linear(tree['out_proj'], f'{prefix}.out_proj', out)


def layernorm(tree: dict, prefix: str, out: dict) -> None:
    out[f'{prefix}.weight'] = _np(tree['scale'])
    out[f'{prefix}.bias'] = _np(tree['bias'])


def batchnorm(params: dict, stats: dict, prefix: str, out: dict) -> None:
    out[f'{prefix}.weight'] = _np(params['bn']['scale'])
    out[f'{prefix}.bias'] = _np(params['bn']['bias'])
    out[f'{prefix}.running_mean'] = _np(stats['bn']['mean'])
    out[f'{prefix}.running_var'] = _np(stats['bn']['var'])
    out[f'{prefix}.num_batches_tracked'] = np.asarray(0, dtype=np.int64)


def wn_conv1d(tree: dict, prefix: str, out: dict,
              legacy_wn: bool = True) -> None:
    v = _np(tree['v']).transpose(2, 1, 0)   # (k,in,out) -> (out,in,k)
    g = _np(tree['g']).reshape(-1, 1, 1)
    if legacy_wn:
        out[f'{prefix}.weight_v'] = v
        out[f'{prefix}.weight_g'] = g
    else:
        out[f'{prefix}.parametrizations.weight.original1'] = v
        out[f'{prefix}.parametrizations.weight.original0'] = g
    out[f'{prefix}.bias'] = _np(tree['bias'])


def conv1d_1x1(tree: dict, prefix: str, out: dict) -> None:
    d = tree['proj']['dense']
    out[f'{prefix}.weight'] = _np(d['kernel']).T[:, :, None]
    out[f'{prefix}.bias'] = _np(d['bias'])


def tcn(tree: dict, prefix: str, num_channels: Sequence[int],
        input_dim: int, out: dict, legacy_wn: bool = True) -> None:
    in_ch = input_dim
    for i, out_ch in enumerate(num_channels):
        blk = tree[f'block{i}']
        wn_conv1d(blk['conv1'], f'{prefix}.network.{i}.conv1', out,
                  legacy_wn)
        wn_conv1d(blk['conv2'], f'{prefix}.network.{i}.conv2', out,
                  legacy_wn)
        # the reference TemporalBlock registers conv1/conv2 a second
        # time inside `self.net = nn.Sequential(conv1, ..., conv2, ...)`
        # (temporal_convolutional_model.py:36-37), so its state_dict
        # carries net.0/net.4 duplicates — strict=True needs them too
        wn_conv1d(blk['conv1'], f'{prefix}.network.{i}.net.0', out,
                  legacy_wn)
        wn_conv1d(blk['conv2'], f'{prefix}.network.{i}.net.4', out,
                  legacy_wn)
        if in_ch != out_ch:
            conv1d_1x1(blk['downsample'],
                       f'{prefix}.network.{i}.downsample', out)
        in_ch = out_ch


def encoder_layer(tree: dict, prefix: str, out: dict) -> None:
    mha(tree['attention'], f'{prefix}.attention', out)
    linear(tree['ff1'], f'{prefix}.feed_forward.0', out)
    linear(tree['ff2'], f'{prefix}.feed_forward.2', out)
    layernorm(tree['layer_norm1'], f'{prefix}.layer_norm1', out)
    layernorm(tree['layer_norm2'], f'{prefix}.layer_norm2', out)


def encoder_block(tree: dict, prefix: str, out: dict,
                  num_layers: int = 1) -> None:
    for i in range(num_layers):
        encoder_layer(tree[f'layer{i}'], f'{prefix}.layers.{i}', out)


def _conv2d(tree: dict, prefix: str, out: dict) -> None:
    # flax HWIO -> torch OIHW
    out[f'{prefix}.weight'] = _np(tree['kernel']).transpose(3, 2, 0, 1)
    if 'bias' in tree:
        out[f'{prefix}.bias'] = _np(tree['bias'])


def _bn2d(params: dict, stats: dict, prefix: str, out: dict) -> None:
    out[f'{prefix}.weight'] = _np(params['scale'])
    out[f'{prefix}.bias'] = _np(params['bias'])
    out[f'{prefix}.running_mean'] = _np(stats['mean'])
    out[f'{prefix}.running_var'] = _np(stats['var'])
    out[f'{prefix}.num_batches_tracked'] = np.asarray(0, dtype=np.int64)


def arcface_to_torch(params: dict, stats: dict, out: dict,
                     prefix: str = 'backbone') -> None:
    """Inverse of arcface.arcface_from_torch (backbone.py layout)."""
    from fvt_tpu.models.arcface import get_blocks_50

    _conv2d(params['input_conv'], f'{prefix}.input_layer.0', out)
    _bn2d(params['input_bn'], stats['input_bn'],
          f'{prefix}.input_layer.1', out)
    out[f'{prefix}.input_layer.2.weight'] = _np(
        params['input_prelu']['alpha'])

    for i, (in_c, depth, stride) in enumerate(get_blocks_50()):
        blk, bst = params[f'body{i}'], stats[f'body{i}']
        base = f'{prefix}.body.{i}'
        if in_c != depth:
            _conv2d(blk['shortcut_conv'], f'{base}.shortcut_layer.0', out)
            _bn2d(blk['shortcut_bn'], bst['shortcut_bn'],
                  f'{base}.shortcut_layer.1', out)
        _bn2d(blk['bn1'], bst['bn1'], f'{base}.res_layer.0', out)
        _conv2d(blk['conv1'], f'{base}.res_layer.1', out)
        out[f'{base}.res_layer.2.weight'] = _np(blk['prelu']['alpha'])
        _conv2d(blk['conv2'], f'{base}.res_layer.3', out)
        _bn2d(blk['bn2'], bst['bn2'], f'{base}.res_layer.4', out)

    _bn2d(params['output_bn2d'], stats['output_bn2d'],
          f'{prefix}.output_layer.0', out)
    # fvt flattens NHWC; torch flattens NCHW (c*25 + h*5 + w)
    w = _np(params['output_linear']['kernel']).T  # (512, 512*5*5) NHWC
    w = w.reshape(512, 5, 5, 512).transpose(0, 3, 1, 2).reshape(512, -1)
    out[f'{prefix}.output_layer.3.weight'] = w
    out[f'{prefix}.output_layer.3.bias'] = _np(
        params['output_linear']['bias'])
    _bn2d(params['output_bn1d'], stats['output_bn1d'],
          f'{prefix}.output_layer.4', out)


def vggish_to_torch(params: dict, out: dict, prefix: str = '') -> None:
    """Inverse of vggish.vggish_from_torch."""
    from fvt_tpu.models.vggish import _torch_feature_indices_list

    p = (prefix + '.') if prefix else ''
    for conv_i, feat_idx in enumerate(_torch_feature_indices_list()):
        w = _np(params[f'conv{conv_i}']['kernel'])  # HWIO
        out[f'{p}features.{feat_idx}.weight'] = w.transpose(3, 2, 0, 1)
        out[f'{p}features.{feat_idx}.bias'] = _np(
            params[f'conv{conv_i}']['bias'])
    for j, emb_idx in enumerate([0, 2, 4]):
        out[f'{p}embeddings.{emb_idx}.weight'] = _np(
            params[f'fc{j}']['kernel']).T
        out[f'{p}embeddings.{emb_idx}.bias'] = _np(
            params[f'fc{j}']['bias'])


def spatial_to_torch(params: dict, stats: dict, out: dict) -> None:
    """Inverse of torch_port.spatial_from_torch — frozen backbones
    embedded in tri-modal fusion checkpoints (model.py:455-463)."""
    if 'spatial_video' in params:
        arcface_to_torch(params['spatial_video']['backbone'],
                         stats['spatial_video']['backbone'], out,
                         prefix='spatial.visual.backbone')
        # VisualBackbone.logits (backbone.py:105) is constructed but
        # never called in forward — DEAD weight synthesized as zeros so
        # strict=True finds the key (fvt_tpu has no counterpart)
        out['spatial.visual.logits.weight'] = np.zeros((8, 512),
                                                       np.float32)
        out['spatial.visual.logits.bias'] = np.zeros(8, np.float32)
    if 'spatial_audio' in params:
        vggish_to_torch(params['spatial_audio'], out,
                        prefix='spatial.audio.backbone')


def lfan_to_torch(params: dict, stats: dict, modality: Sequence[str],
                  tcn_channel: Dict[str, Sequence[int]],
                  embedding_dim: Dict[str, int],
                  legacy_wn: bool = True) -> Dict[str, np.ndarray]:
    """Inverse of torch_port.lfan_from_torch (+ embedded backbones)."""
    out: Dict[str, np.ndarray] = {}
    for modal in modality:
        tcn(params[f'temporal_{modal}'], f'temporal.{modal}',
            tcn_channel[modal], embedding_dim[modal], out, legacy_wn)
        batchnorm(params[f'bn_{modal}'], stats[f'bn_{modal}'],
                  f'bn.{modal}', out)

    fusion = params['fusion']
    for modal in modality:
        linear(fusion['self_attn'][f'qkv_{modal}'],
               f'fusion.layers.self_attn.qkv_proj.{modal}', out)
    linear(fusion['self_attn']['o_proj'],
           'fusion.layers.self_attn.o_proj', out)
    layernorm(fusion['norm1'], 'fusion.layers.norm1', out)
    linear(params['regressor'], 'regressor', out)
    spatial_to_torch(params, stats, out)
    return out


def can_to_torch(params: dict, stats: dict, modality: Sequence[str],
                 tcn_settings: Dict[str, dict],
                 legacy_wn: bool = True) -> Dict[str, np.ndarray]:
    """Inverse of torch_port.can_from_torch (+ embedded backbones)."""
    out: Dict[str, np.ndarray] = {}
    for modal in modality:
        tcn(params[f'temporal_{modal}'], f'temporal.{modal}',
            tcn_settings[modal]['channel'],
            tcn_settings[modal]['input_dim'], out, legacy_wn)
        batchnorm(params[f'bn_{modal}'], stats[f'bn_{modal}'],
                  f'bn.{modal}', out)

    for i in range(len(modality)):
        linear(params['fuse'][f'attn_{i}'], f'fuse.attn.{i}', out)
    linear(params['fuse']['weights'], 'fuse.weights', out)

    # CAN.conv_c (model.py:607) is constructed but never used in
    # forward — DEAD weight synthesized as zeros for strict=True
    n = 128 * len(modality)
    out['conv_c.weight'] = np.zeros((128, n, 1), np.float32)
    out['conv_c.bias'] = np.zeros(128, np.float32)

    linear(params['fc1'], 'fc1', out)
    batchnorm(params['bn1'], stats['bn1'], 'bn1', out)
    linear(params['fc2'], 'fc2', out)
    spatial_to_torch(params, stats, out)
    return out


def jmt_to_torch(params: dict, stats: dict, modality: Sequence[str],
                 tcn_settings: Dict[str, dict], joint: bool = True,
                 legacy_wn: bool = True) -> Dict[str, np.ndarray]:
    """Inverse of torch_port.jmt_from_torch (+ embedded backbones)."""
    out: Dict[str, np.ndarray] = {}
    for modal in modality:
        tcn(params[f'temporal_{modal}'], f'temporal.{modal}',
            tcn_settings[modal]['channel'],
            tcn_settings[modal]['input_dim'], out, legacy_wn)
        batchnorm(params[f'bn_{modal}'], stats[f'bn_{modal}'],
                  f'bn.{modal}', out)

    fuse = params['fuse']
    linear(fuse['augment_audio'], 'fuse.augment_audio_feats_dim', out)
    encoder_block(fuse['visual_encoder'], 'fuse.visual_encoder', out)
    encoder_block(fuse['audio_encoder'], 'fuse.audio_encoder', out)
    mha(fuse['CA_va'], 'fuse.CA_va', out)
    mha(fuse['CA_av'], 'fuse.CA_av', out)
    encoder_block(fuse['final_encoder'], 'fuse.final_encoder', out)
    mha(fuse['final_self_attention'], 'fuse.final_self_attention', out)
    if joint:
        linear(fuse['reduce_feats'], 'fuse.reduce_feats_dim', out)
        encoder_block(fuse['jr_encoder'], 'fuse.jr_encoder', out)
        mha(fuse['CA_jrv'], 'fuse.CA_jrv', out)
        mha(fuse['CA_vjr'], 'fuse.CA_vjr', out)
        mha(fuse['CA_jra'], 'fuse.CA_jra', out)
        mha(fuse['CA_ajr'], 'fuse.CA_ajr', out)
    else:
        # MTFusion constructs reduce_feats_dim but never calls it in
        # forward (model.py:1006) — DEAD weight synthesized as zeros
        out['fuse.reduce_feats_dim.weight'] = np.zeros((128, 256),
                                                       np.float32)
        out['fuse.reduce_feats_dim.bias'] = np.zeros(128, np.float32)

    linear(params['fc1'], 'fc1', out)
    batchnorm(params['bn1'], stats['bn1'], 'bn1', out)
    linear(params['fc2'], 'fc2', out)
    spatial_to_torch(params, stats, out)
    return out


def export_state_dict(model_name: str, params: dict, stats: dict,
                      modality: Sequence[str],
                      legacy_wn: bool = True) -> Dict[str, np.ndarray]:
    """Dispatch by reference model name; modality excludes *_continuous_label
    entries (like the reference's init_model filter, experiment.py:299)."""
    from fvt_tpu.config import model_config as MC

    modality = [m for m in modality if 'continuous_label' not in m]
    if model_name == 'LFAN':
        return lfan_to_torch(params, stats, modality, MC.TCN_CHANNELS,
                             MC.EMBEDDING_DIM, legacy_wn)
    if model_name == 'CAN':
        return can_to_torch(params, stats, modality, MC.TCN_SETTINGS,
                            legacy_wn)
    if model_name in ('JMT', 'MT'):
        return jmt_to_torch(params, stats, modality, MC.TCN_SETTINGS,
                            joint=(model_name == 'JMT'),
                            legacy_wn=legacy_wn)
    raise ValueError(f'unknown model_name: {model_name}')
