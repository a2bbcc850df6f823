"""Offline visual feature extraction: face crops -> ArcFace embeddings.

The reference's extractor chain has a 'cnn' step (base/preprocessing.py
extract_cnn_fn path; tcn_settings 'cnn'/'cnn_res50', configs.py:85-94)
producing per-frame 512-d ResNet features so training can consume
precomputed embeddings instead of raw frames.  Here the whole video runs
through the TPU ArcFace in fixed-size batches.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


# one-entry jitted-forward cache, same rationale as
# preprocess.audio._vggish_forward: a fresh jit closure per trial
# forces a retrace of the identical fixed-shape program every call
_CNN_FWD_CACHE: dict = {}


def _cnn_forward(params: dict, stats: dict, dtype):
    import jax
    import jax.numpy as jnp
    from fvt_tpu.models.arcface import VisualBackbone
    from fvt_tpu.data.transforms import eval_video_transform

    key = (id(params), id(stats), dtype)
    hit = _CNN_FWD_CACHE.get(key)
    if hit is not None:
        return hit[1]
    model = VisualBackbone(dtype=dtype or jnp.float32)

    @jax.jit
    def forward(frames):  # (B, H, W, 3) uint8
        x = eval_video_transform(frames[None].astype(jnp.float32))[0]
        return model.apply({'params': params, 'batch_stats': stats},
                           x, train=False)

    _CNN_FWD_CACHE.clear()
    _CNN_FWD_CACHE[key] = ((params, stats), forward)
    return forward


def extract_cnn_features(video: np.ndarray, params: dict, stats: dict,
                         batch: int = 512, dtype=None) -> np.ndarray:
    """(T, H, W, 3) uint8 face crops -> (T, 512) ArcFace embeddings.

    Applies the eval transform (resize 48 -> center crop 40 -> normalize
    — the crop size is fixed by the transform, data/transforms.py) then
    the frozen backbone, batched for shape-stable jits.
    """
    import jax.numpy as jnp

    forward = _cnn_forward(params, stats, dtype)

    t = video.shape[0]
    out = np.zeros((t, 512), dtype=np.float32)
    for start in range(0, t, batch):
        chunk = video[start:start + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        emb = np.asarray(forward(jnp.asarray(chunk)))
        out[start:start + batch - pad] = emb[:batch - pad]
    return out


def extract_cnn_to_npy(trial_dir: str, params: dict, stats: dict,
                       feature_name: str = 'cnn'):
    """video.npy -> <feature_name>.npy in the same per-trial store."""
    out_path = os.path.join(trial_dir, f'{feature_name}.npy')
    if os.path.isfile(out_path):
        return
    video = np.load(os.path.join(trial_dir, 'video.npy'))
    feats = extract_cnn_features(video, params, stats)
    np.save(out_path, feats)
