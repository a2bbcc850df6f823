"""Batched, jit-able group video transforms.

Replaces the reference's per-frame PIL pipeline
(/root/reference/base/transforms3D.py:10-145, wiring base/dataset.py:487-539)
with device-side batched ops:

  train: resize 48 -> random crop 40 (one offset per window) -> random
         hflip (per window) -> /255 -> normalize(0.5, 0.5)
  eval:  resize 48 -> center crop 40 -> /255 -> normalize(0.5, 0.5)

Resampling uses jax.image bilinear (PIL-bilinear-equivalent up to resampling
kernel details; the backbone is robust to this).  Group semantics: the same
crop/flip is applied to every frame of a window, as the reference's Group*
transforms do.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SCALE_SIZE = 48
CROP_SIZE = 40


def center_crop_offset(size: int, crop: int) -> int:
    """THE center-crop offset convention (torch CenterCrop floor,
    reference base/transforms3D.py GroupCenterCrop).  Every site that
    center-crops — the device transform, trainer.maybe_precrop, the
    ExampleBuilder slice, and native_store's fused resize weights —
    must use this one helper so the advertised bit-identity between
    those paths can never drift on a convention change."""
    return (size - crop) // 2


def _resize_frames(video: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B, T, H, W, 3) -> (B, T, size, size, 3), bilinear+antialias.

    No-op when the loader already host-resized to ``size`` (the shape
    test is static at trace time).

    Implemented as the two separable weight-matrix contractions (the
    exact jax.image.resize 'bilinear' kernel — same matrices as the host
    path, tests/test_host_resize.py): on TPU these are two MXU matmuls.
    jax.image.resize itself lowers to a scatter/gather program that
    measured ~3 orders of magnitude slower on a 300-frame 256^2 batch
    over the axon tunnel."""
    b, t, h, w, c = video.shape
    if h == size and w == size:
        return video
    from fvt_tpu.data.host_resize import resize_weights
    wh = jnp.asarray(resize_weights(h, size))   # (size, h)
    ww = jnp.asarray(resize_weights(w, size))
    x = jnp.einsum('sh,bthwc->btswc', wh, video,
                   preferred_element_type=jnp.float32)
    return jnp.einsum('pw,btswc->btspc', ww, x,
                      preferred_element_type=jnp.float32)


def train_video_transform(video: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """uint8/float (B, T, H, W, 3) -> normalized float32 (B, T, 40, 40, 3)."""
    b = video.shape[0]
    x = _resize_frames(video.astype(jnp.float32), SCALE_SIZE)

    k1, k2, k3 = jax.random.split(rng, 3)
    max_off = SCALE_SIZE - CROP_SIZE
    offs_h = jax.random.randint(k1, (b,), 0, max_off + 1)
    offs_w = jax.random.randint(k2, (b,), 0, max_off + 1)
    flip = jax.random.bernoulli(k3, 0.5, (b,))

    def crop_one(frames, oh, ow, fl):
        cropped = jax.lax.dynamic_slice(
            frames, (0, oh, ow, 0),
            (frames.shape[0], CROP_SIZE, CROP_SIZE, frames.shape[3]))
        return jax.lax.cond(fl, lambda v: v[:, :, ::-1, :], lambda v: v,
                            cropped)

    x = jax.vmap(crop_one)(x, offs_h, offs_w, flip)
    x = x / 255.0
    return (x - 0.5) / 0.5


def eval_video_transform(video: jnp.ndarray) -> jnp.ndarray:
    # Already CROP_SIZE^2: the host pre-cropped before upload
    # (--h2d_precrop_video — the center crop of eval is deterministic,
    # so slicing 48->40 host-side is bit-identical to doing it here and
    # ships 31% fewer video bytes over H2D).  The shape test is static
    # at trace time.  NB a *native* 40^2 store is out of the disk
    # contract (stores are 256^2 or recompacted 48^2); under the
    # reference it would be upscaled to 48 then cropped — here it is
    # treated as pre-cropped.
    if video.shape[-2] == CROP_SIZE and video.shape[-3] == CROP_SIZE:
        x = video.astype(jnp.float32)
    else:
        x = _resize_frames(video.astype(jnp.float32), SCALE_SIZE)
        off = center_crop_offset(SCALE_SIZE, CROP_SIZE)
        x = x[:, :, off:off + CROP_SIZE, off:off + CROP_SIZE, :]
    x = x / 255.0
    return (x - 0.5) / 0.5
