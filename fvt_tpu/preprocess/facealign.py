"""5-point face alignment: similarity transform + batched affine warp.

TPU-native equivalent of the face.evoLVe warp used by the reference
(/root/reference/abaw5_pre_processing/dlib/face_landmarks/
retinaface_align.py:239-252): estimate the cp2tform-style similarity
transform from 5 facial landmarks to canonical reference points, then warp
to a square crop.  The transform solve is tiny host math (lstsq); the warp
itself is a batched bilinear sampler that jits/vmaps over frames — the
batched-image-op analogue of per-frame cv2.warpAffine.

The detector is pluggable (the reference's RetinaFace is an external
package); any callable image -> list[(bbox, score, 5-landmarks)] works.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# canonical 5 points for a 96x112 crop (public face-alignment constants)
REFERENCE_FACIAL_POINTS = np.array([
    [30.29459953, 51.69630051],
    [65.53179932, 51.50139999],
    [48.02519989, 71.73660278],
    [33.54930115, 92.36550140],
    [62.72990036, 92.20410156],
], dtype=np.float32)
DEFAULT_CROP_SIZE = (96, 112)


def get_reference_facial_points(output_size: Optional[Tuple[int, int]] = None,
                                default_square: bool = False) -> np.ndarray:
    ref = REFERENCE_FACIAL_POINTS.copy()
    size = np.array(DEFAULT_CROP_SIZE, dtype=np.float32)
    if default_square:
        diff = size.max() - size
        ref += diff[None] / 2.0
        size += diff
    if output_size is not None:
        scale = np.array(output_size, dtype=np.float32) / size
        assert np.allclose(scale[0], scale[1]), 'non-uniform scale'
        ref *= scale[None]
    return ref


def _nonreflective_similarity(uv: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """cp2tform 'nonreflective similarity': 3x3 T with [u v 1] = [x y 1] T."""
    m = xy.shape[0]
    x = xy[:, 0:1]
    y = xy[:, 1:2]
    ones = np.ones((m, 1))
    zeros = np.zeros((m, 1))
    X = np.vstack([np.hstack([x, y, ones, zeros]),
                   np.hstack([y, -x, zeros, ones])])
    U = np.vstack([uv[:, 0:1], uv[:, 1:2]])
    r, _, rank, _ = np.linalg.lstsq(X, U, rcond=None)
    assert rank >= 3, 'points are degenerate'
    sc, ss, tx, ty = r.flatten()
    Tinv = np.array([[sc, -ss, 0.0], [ss, sc, 0.0], [tx, ty, 1.0]])
    return np.linalg.inv(Tinv)  # maps uv -> xy as [x y 1] = [u v 1] T


def similarity_transform(src_pts: np.ndarray, dst_pts: np.ndarray
                         ) -> np.ndarray:
    """Best of non-reflective / reflective similarity (cp2tform), returned
    as a 2x3 cv2-style matrix mapping src -> dst."""
    src = np.asarray(src_pts, dtype=np.float64).reshape(-1, 2)
    dst = np.asarray(dst_pts, dtype=np.float64).reshape(-1, 2)

    t1 = _nonreflective_similarity(src, dst)

    dst_r = dst.copy()
    dst_r[:, 0] = -dst_r[:, 0]
    t2r = _nonreflective_similarity(src, dst_r)
    reflect = np.array([[-1.0, 0, 0], [0, 1, 0], [0, 0, 1]])
    t2 = t2r @ reflect

    def norm_err(T):
        pts = np.hstack([src, np.ones((src.shape[0], 1))]) @ T
        return np.linalg.norm(pts[:, :2] - dst)

    T = t1 if norm_err(t1) <= norm_err(t2) else t2
    return T[:, :2].T  # 2x3


def invert_affine(tfm: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine matrix."""
    A = tfm[:, :2]
    b = tfm[:, 2]
    Ainv = np.linalg.inv(A)
    return np.hstack([Ainv, (-Ainv @ b)[:, None]])


@jax.jit
def _bilinear_warp(img: jnp.ndarray, inv_tfm: jnp.ndarray,
                   grid: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W, C) at affine-mapped output grid (h*w, 3)."""
    src = grid @ inv_tfm.T  # (h*w, 2) x,y in source coords
    xs, ys = src[:, 0], src[:, 1]
    h, w = img.shape[:2]

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = xs - x0
    dy = ys - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = img[yi, xi]
        return jnp.where(valid[:, None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - dx)[:, None] + v01 * dx[:, None]
    bot = v10 * (1 - dx)[:, None] + v11 * dx[:, None]
    return top * (1 - dy)[:, None] + bot * dy[:, None]


def warp_affine(img: np.ndarray, tfm: np.ndarray,
                out_size: Tuple[int, int]) -> np.ndarray:
    """cv2.warpAffine-equivalent bilinear warp (border 0)."""
    w_out, h_out = out_size
    inv = invert_affine(np.asarray(tfm, dtype=np.float32))
    ys, xs = np.mgrid[0:h_out, 0:w_out]
    grid = np.stack([xs.ravel(), ys.ravel(),
                     np.ones(h_out * w_out)], axis=1).astype(np.float32)
    out = _bilinear_warp(jnp.asarray(img, dtype=jnp.float32),
                         jnp.asarray(inv), jnp.asarray(grid))
    out = np.asarray(out).reshape(h_out, w_out, -1)
    if img.dtype == np.uint8:
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out


def warp_and_crop_face(src_img: np.ndarray, facial_pts,
                       reference_pts: Optional[np.ndarray] = None,
                       crop_size: Tuple[int, int] = (112, 112)
                       ) -> np.ndarray:
    """5-point similarity warp to the canonical crop
    (face.evoLVe warp_and_crop_face semantics)."""
    if reference_pts is None:
        scale = crop_size[0] / 112.0
        reference_pts = get_reference_facial_points(
            default_square=True) * scale
    tfm = similarity_transform(np.asarray(facial_pts, dtype=np.float32),
                               reference_pts)
    return warp_affine(src_img, tfm, crop_size)


def batched_warp_faces(frames: np.ndarray, landmarks: np.ndarray,
                       out_size: int = 256) -> np.ndarray:
    """Warp a whole video's frames in one device pass.

    frames (T, H, W, 3); landmarks (T, 5, 2).  Transforms are solved on
    host (T tiny lstsq's), sampling is one vmapped device program.
    """
    scale = out_size / 112.0
    reference = get_reference_facial_points(default_square=True) * scale
    invs = np.stack([
        invert_affine(similarity_transform(lm, reference))
        for lm in landmarks]).astype(np.float32)

    ys, xs = np.mgrid[0:out_size, 0:out_size]
    grid = np.stack([xs.ravel(), ys.ravel(),
                     np.ones(out_size * out_size)], axis=1
                    ).astype(np.float32)

    out = jax.vmap(_bilinear_warp, in_axes=(0, 0, None))(
        jnp.asarray(frames, dtype=jnp.float32), jnp.asarray(invs),
        jnp.asarray(grid))
    out = np.asarray(out).reshape(frames.shape[0], out_size, out_size, -1)
    if frames.dtype == np.uint8:
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out
