"""VGGish audio backbone (frozen): (N, 96, 64) log-mel patch -> 128-d.

Re-implementation of /root/reference/models/backbone.py:16-66 (and the
preprocessing twin abaw5_pre_processing/base/vggish/vggish.py): VGG conv
stack [64, M, 128, M, 256, 256, M, 512, 512, M] + 3-layer MLP embeddings.
NHWC layout; torch's post-conv transpose-to-(H, W, C)-then-flatten is the
NHWC natural order, so the embedding weights port with a plain transpose.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as nn

VGG_CFG = [64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M']


class VGGish(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.ndim == 3:
            x = x[..., None]  # (N, 96, 64) -> NHWC
        x = x.astype(self.dtype)
        conv_i = 0
        for v in VGG_CFG:
            if v == 'M':
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f'conv{conv_i}')(x)
                x = nn.relu(x)
                conv_i += 1
        x = x.astype(jnp.float32)
        x = x.reshape(x.shape[0], -1)  # (N, 6*4*512)
        x = nn.Dense(4096, name='fc0')(x)
        x = nn.relu(x)
        x = nn.Dense(4096, name='fc1')(x)
        x = nn.relu(x)
        x = nn.Dense(128, name='fc2')(x)
        return x


def _np(x):
    import numpy as np
    if hasattr(x, 'detach'):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def vggish_from_torch(sd: dict, prefix: str = '') -> dict:
    """Params for :class:`VGGish` from the torch VGG state_dict
    (features.{0,3,6,8,11,13}, embeddings.{0,2,4})."""
    p = (prefix + '.') if prefix else ''
    params: dict = {}
    for conv_i, feat_idx in enumerate(_torch_feature_indices_list()):
        w = _np(sd[f'{p}features.{feat_idx}.weight'])  # OIHW
        params[f'conv{conv_i}'] = {
            'kernel': w.transpose(2, 3, 1, 0),
            'bias': _np(sd[f'{p}features.{feat_idx}.bias'])}
    for j, emb_idx in enumerate([0, 2, 4]):
        params[f'fc{j}'] = {
            'kernel': _np(sd[f'{p}embeddings.{emb_idx}.weight']).T,
            'bias': _np(sd[f'{p}embeddings.{emb_idx}.bias'])}
    return params


def _torch_feature_indices_list():
    """Sequential indices of Conv2d layers in make_layers()
    (backbone.py:42-52): conv,relu per non-M entry, maxpool per M."""
    idx, out = 0, []
    for v in VGG_CFG:
        if v == 'M':
            idx += 1
        else:
            out.append(idx)
            idx += 2
    return out

