"""2D-FAN-4 68-point facial landmark network, JAX/flax port.

The reference extracts 68-pt landmarks with the ``face_alignment``
package (base/preprocessing.py:191-195: ``FaceAlignment(LandmarksType
._2D)``, i.e. the 4-stack 2D FAN of Bulat & Tzimiropoulos), feeding the
landmark.npy feature (cols 5..140 of the facial_landmark csv,
base/preprocessing.py's extract_facial_landmark_fn) and the AU pipeline.
This module re-implements the full inference network natively so the
68-pt path needs NO torch packages:

  * base: 7x7/s2 conv (3->64) + BN/ReLU, ConvBlock(128), avgpool/2,
    ConvBlock(128), ConvBlock(256);
  * 4 stacked depth-4 hourglass modules (nearest-neighbor upsampling,
    avg-pool downsampling) with the FAN ConvBlock (3-way split
    out/2 + out/4 + out/4 channel concat, pre-activation BN/ReLU,
    1x1 BN/ReLU/conv shortcut on channel change);
  * per-stack head: ConvBlock(256) -> 1x1 conv + BN/ReLU -> 1x1 conv to
    68 heatmaps (64x64); intermediate supervision wiring
    (previous + bl(ll) + al(heatmaps)) between stacks;
  * the face_alignment crop contract: detector bbox -> center (y pulled
    up by 12% of the box height) and scale = (w+h)/195, 256x256 crop
    window via the 200*scale reference frame, bilinear resample;
  * heatmap decode (get_preds_fromhm): per-map argmax, +-0.25 px
    sub-pixel shift toward the larger neighbor, -0.5, then the inverse
    center/scale transform back to original image coordinates.

Weights: :func:`port_torch_state_dict` converts the published
``2DFAN4-cd938726ad.zip`` torch-hub state dict (the same file
face_alignment downloads) to this model's (params, batch_stats).  The
checkpoint ships with neither this image nor the reference repo — the
loader accepts a path via ``FVT_FAN_WEIGHTS`` or the torch-hub default
location.  The architecture and the port's name/shape mapping are
pinned by tests/test_fan.py with a synthetic state dict (no torch
needed).

The detector supplying the bbox is pluggable; by default compose with
``preprocess.faces.default_detector()`` (native RetinaFace when its
weights are present).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

N_LANDMARKS = 68
N_STACKS = 4
HG_DEPTH = 4
FEATS = 256
REFERENCE_SCALE = 195.0
CROP_RESOLUTION = 256
HEATMAP_RESOLUTION = 64


# ------------------------------------------------------------------ blocks
class ConvBlock(nn.Module):
    """face_alignment.net.ConvBlock: pre-activation 3-way split block.

    out/2 + out/4 + out/4 channels concatenated; BN/ReLU/1x1 shortcut
    when the channel count changes.
    """
    features: int

    @nn.compact
    def __call__(self, x):
        f = self.features
        out1 = nn.relu(nn.BatchNorm(use_running_average=True,
                                    momentum=0.9, epsilon=1e-5,
                                    name='bn1')(x))
        out1 = nn.Conv(f // 2, (3, 3), padding=1, use_bias=False,
                       name='conv1')(out1)
        out2 = nn.relu(nn.BatchNorm(use_running_average=True,
                                    momentum=0.9, epsilon=1e-5,
                                    name='bn2')(out1))
        out2 = nn.Conv(f // 4, (3, 3), padding=1, use_bias=False,
                       name='conv2')(out2)
        out3 = nn.relu(nn.BatchNorm(use_running_average=True,
                                    momentum=0.9, epsilon=1e-5,
                                    name='bn3')(out2))
        out3 = nn.Conv(f // 4, (3, 3), padding=1, use_bias=False,
                       name='conv3')(out3)
        cat = jnp.concatenate([out1, out2, out3], axis=-1)
        if x.shape[-1] != f:
            res = nn.relu(nn.BatchNorm(use_running_average=True,
                                       momentum=0.9, epsilon=1e-5,
                                       name='down_bn')(x))
            res = nn.Conv(f, (1, 1), use_bias=False,
                          name='down_conv')(res)
        else:
            res = x
        return cat + res


def _avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _upsample2_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class HourGlass(nn.Module):
    """Depth-4 recursive hourglass (face_alignment.net.HourGlass)."""
    depth: int = HG_DEPTH

    @nn.compact
    def __call__(self, x):
        def level(inp, d):
            up1 = ConvBlock(FEATS, name=f'b1_{d}')(inp)
            low1 = _avg_pool2(inp)
            low1 = ConvBlock(FEATS, name=f'b2_{d}')(low1)
            if d > 1:
                low2 = level(low1, d - 1)
            else:
                low2 = ConvBlock(FEATS, name=f'b2_plus_{d}')(low1)
            low3 = ConvBlock(FEATS, name=f'b3_{d}')(low2)
            return up1 + _upsample2_nearest(low3)
        return level(x, self.depth)


class FAN(nn.Module):
    """4-stack FAN; input (N, 256, 256, 3) in [0,1]; returns the last
    stack's (N, 64, 64, 68) heatmaps (face_alignment uses out[-1])."""
    num_stacks: int = N_STACKS

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=True,
                    name='conv1')(x)
        x = nn.relu(nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, name='bn1')(x))
        x = ConvBlock(128, name='conv2')(x)
        x = _avg_pool2(x)
        x = ConvBlock(128, name='conv3')(x)
        x = ConvBlock(256, name='conv4')(x)

        previous = x
        tmp_out = None
        for i in range(self.num_stacks):
            hg = HourGlass(name=f'm{i}')(previous)
            ll = ConvBlock(FEATS, name=f'top_m_{i}')(hg)
            ll = nn.Conv(FEATS, (1, 1), use_bias=True,
                         name=f'conv_last{i}')(ll)
            ll = nn.relu(nn.BatchNorm(use_running_average=True,
                                      momentum=0.9, epsilon=1e-5,
                                      name=f'bn_end{i}')(ll))
            tmp_out = nn.Conv(N_LANDMARKS, (1, 1), use_bias=True,
                              name=f'l{i}')(ll)
            if i < self.num_stacks - 1:
                ll_ = nn.Conv(FEATS, (1, 1), use_bias=True,
                              name=f'bl{i}')(ll)
                tmp_out_ = nn.Conv(FEATS, (1, 1), use_bias=True,
                                  name=f'al{i}')(tmp_out)
                previous = previous + ll_ + tmp_out_
        return tmp_out


# --------------------------------------------------- crop / decode contract
def _transform_matrix(center, scale, resolution: float) -> np.ndarray:
    """face_alignment utils.transform's 3x3 output->input-frame map."""
    h = 200.0 * scale
    t = np.eye(3)
    t[0, 0] = resolution / h
    t[1, 1] = resolution / h
    t[0, 2] = resolution * (-center[0] / h + 0.5)
    t[1, 2] = resolution * (-center[1] / h + 0.5)
    return t


def transform_point(point, center, scale, resolution: float,
                    invert: bool = False) -> np.ndarray:
    """Map a (x, y) point between crop and original frames; truncates to
    int like face_alignment.utils.transform."""
    t = _transform_matrix(center, scale, resolution)
    if invert:
        t = np.linalg.inv(t)
    pt = np.array([point[0], point[1], 1.0])
    return (t @ pt)[:2].astype(np.int64).astype(np.float64)


def bbox_to_center_scale(bbox) -> Tuple[np.ndarray, float]:
    """face_alignment api.py: center with 12%-height lift, (w+h)/195."""
    x1, y1, x2, y2 = [float(v) for v in bbox[:4]]
    center = np.array([(x1 + x2) / 2.0, (y1 + y2) / 2.0])
    center[1] -= (y2 - y1) * 0.12
    scale = (x2 - x1 + y2 - y1) / REFERENCE_SCALE
    return center, scale


def crop_face(image: np.ndarray, center, scale,
              resolution: int = CROP_RESOLUTION) -> np.ndarray:
    """face_alignment utils.crop: subwindow + bilinear resize to 256."""
    ul = transform_point([1, 1], center, scale, resolution, invert=True)
    br = transform_point([resolution, resolution], center, scale,
                         resolution, invert=True)
    ul = ul.astype(int)
    br = br.astype(int)
    ht, wd = image.shape[0], image.shape[1]
    new_dim = np.array([br[1] - ul[1], br[0] - ul[0], 3], dtype=np.int32)
    new_img = np.zeros(new_dim, dtype=np.float32)
    new_x = np.array([max(1, -ul[0] + 1), min(br[0], wd) - ul[0]],
                     dtype=np.int32)
    new_y = np.array([max(1, -ul[1] + 1), min(br[1], ht) - ul[1]],
                     dtype=np.int32)
    old_x = np.array([max(1, ul[0] + 1), min(br[0], wd)], dtype=np.int32)
    old_y = np.array([max(1, ul[1] + 1), min(br[1], ht)], dtype=np.int32)
    new_img[new_y[0] - 1:new_y[1], new_x[0] - 1:new_x[1]] = \
        image[old_y[0] - 1:old_y[1], old_x[0] - 1:old_x[1]]
    return _resize_bilinear(new_img, resolution, resolution)


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int
                     ) -> np.ndarray:
    """cv2.INTER_LINEAR-convention bilinear resize (half-pixel centers)."""
    in_h, in_w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, in_w - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def decode_heatmaps(hm: np.ndarray, center, scale) -> np.ndarray:
    """face_alignment utils.get_preds_fromhm for one face.

    hm: (64, 64, 68) -> (68, 2) landmarks in ORIGINAL image coords.
    """
    h, w, k = hm.shape
    flat = hm.reshape(h * w, k)
    idx = flat.argmax(axis=0)
    px = (idx % w).astype(np.float64)
    py = (idx // w).astype(np.float64)
    preds = np.stack([px + 1, py + 1], axis=1)  # 1-based like torch code
    for j in range(k):
        ix, iy = int(px[j]), int(py[j])
        if 0 < ix < w - 1 and 0 < iy < h - 1:
            dx = hm[iy, ix + 1, j] - hm[iy, ix - 1, j]
            dy = hm[iy + 1, ix, j] - hm[iy - 1, ix, j]
            preds[j, 0] += np.sign(dx) * 0.25
            preds[j, 1] += np.sign(dy) * 0.25
    preds -= 0.5
    out = np.zeros((k, 2), dtype=np.float32)
    for j in range(k):
        out[j] = transform_point(preds[j], center, scale, h, invert=True)
    return out


# ------------------------------------------------------------- weight port
from fvt_tpu.preprocess.torch_port import (torch_bn as _bn,
                                            torch_conv as _conv)


def _convblock(sd, p):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        bnp, bns = _bn(sd, f'{p}.bn{i}')
        params[f'bn{i}'], stats[f'bn{i}'] = bnp, bns
        params[f'conv{i}'] = _conv(sd, f'{p}.conv{i}', bias=False)
    if p + '.downsample.0.weight' in sd:
        bnp, bns = _bn(sd, p + '.downsample.0')
        params['down_bn'], stats['down_bn'] = bnp, bns
        params['down_conv'] = _conv(sd, p + '.downsample.2', bias=False)
    return params, stats


def port_torch_state_dict(sd: Dict[str, Any]
                          ) -> Tuple[dict, dict]:
    """2DFAN4 torch state dict -> (params, batch_stats) for FAN()."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {'conv1': _conv(sd, 'conv1', bias=True)}
    stats: Dict[str, Any] = {}
    params['bn1'], stats['bn1'] = _bn(sd, 'bn1')
    for name in ('conv2', 'conv3', 'conv4'):
        params[name], stats[name] = _convblock(sd, name)
    for i in range(N_STACKS):
        hgp: Dict[str, Any] = {}
        hgs: Dict[str, Any] = {}
        for d in range(1, HG_DEPTH + 1):
            for b in ('b1', 'b2', 'b3'):
                hgp[f'{b}_{d}'], hgs[f'{b}_{d}'] = _convblock(
                    sd, f'm{i}.{b}_{d}')
            if d == 1:
                hgp['b2_plus_1'], hgs['b2_plus_1'] = _convblock(
                    sd, f'm{i}.b2_plus_1')
        params[f'm{i}'], stats[f'm{i}'] = hgp, hgs
        params[f'top_m_{i}'], stats[f'top_m_{i}'] = _convblock(
            sd, f'top_m_{i}')
        params[f'conv_last{i}'] = _conv(sd, f'conv_last{i}', bias=True)
        params[f'bn_end{i}'], stats[f'bn_end{i}'] = _bn(sd, f'bn_end{i}')
        params[f'l{i}'] = _conv(sd, f'l{i}', bias=True)
        if i < N_STACKS - 1:
            params[f'bl{i}'] = _conv(sd, f'bl{i}', bias=True)
            params[f'al{i}'] = _conv(sd, f'al{i}', bias=True)
    return params, stats


def _convblock_shapes(shapes, p, cin, f):
    shapes[f'{p}.bn1.weight'] = (cin,)
    shapes[f'{p}.conv1.weight'] = (f // 2, cin, 3, 3)
    shapes[f'{p}.bn2.weight'] = (f // 2,)
    shapes[f'{p}.conv2.weight'] = (f // 4, f // 2, 3, 3)
    shapes[f'{p}.bn3.weight'] = (f // 4,)
    shapes[f'{p}.conv3.weight'] = (f // 4, f // 4, 3, 3)
    if cin != f:
        shapes[f'{p}.downsample.0.weight'] = (cin,)
        shapes[f'{p}.downsample.2.weight'] = (f, cin, 1, 1)


def expected_state_dict_shapes() -> Dict[str, tuple]:
    """Torch key -> weight shape for the 2DFAN4 checkpoint; drives the
    synthetic-state-dict port test (conv weights listed; each .bnX also
    carries .bias/.running_mean/.running_var of the same length)."""
    shapes: Dict[str, tuple] = {
        'conv1.weight': (64, 3, 7, 7), 'conv1.bias': (64,),
        'bn1.weight': (64,),
    }
    _convblock_shapes(shapes, 'conv2', 64, 128)
    _convblock_shapes(shapes, 'conv3', 128, 128)
    _convblock_shapes(shapes, 'conv4', 128, 256)
    for i in range(N_STACKS):
        for d in range(1, HG_DEPTH + 1):
            for b in ('b1', 'b2', 'b3'):
                _convblock_shapes(shapes, f'm{i}.{b}_{d}', FEATS, FEATS)
            if d == 1:
                _convblock_shapes(shapes, f'm{i}.b2_plus_1', FEATS,
                                  FEATS)
        _convblock_shapes(shapes, f'top_m_{i}', FEATS, FEATS)
        shapes[f'conv_last{i}.weight'] = (FEATS, FEATS, 1, 1)
        shapes[f'conv_last{i}.bias'] = (FEATS,)
        shapes[f'bn_end{i}.weight'] = (FEATS,)
        shapes[f'l{i}.weight'] = (N_LANDMARKS, FEATS, 1, 1)
        shapes[f'l{i}.bias'] = (N_LANDMARKS,)
        if i < N_STACKS - 1:
            shapes[f'bl{i}.weight'] = (FEATS, FEATS, 1, 1)
            shapes[f'bl{i}.bias'] = (FEATS,)
            shapes[f'al{i}.weight'] = (FEATS, N_LANDMARKS, 1, 1)
            shapes[f'al{i}.bias'] = (FEATS,)
    return shapes


def _default_weights_path() -> Optional[str]:
    p = os.environ.get('FVT_FAN_WEIGHTS')
    if p:
        # an explicitly-set path must fail loudly, not silently degrade
        # to "weights absent" (mirrors retinaface._default_weights_path)
        if not os.path.isfile(p):
            raise FileNotFoundError(
                f'FVT_FAN_WEIGHTS is set but no file exists at {p!r}')
        return p
    hub = os.path.join(
        os.environ.get('TORCH_HOME',
                       os.path.expanduser('~/.cache/torch')),
        'hub', 'checkpoints', '2DFAN4-cd938726ad.zip')
    return hub if os.path.isfile(hub) else None


# ---------------------------------------------------------------- runtime
class FANLandmarks:
    """68-pt landmark extractor: detector bbox in, (68, 2) out.

    Usage::

        fan = FANLandmarks()                      # needs weights
        lms = fan.predict(img_rgb_u8, bbox)       # original coords
    """

    def __init__(self, weights_path: Optional[str] = None):
        path = weights_path or _default_weights_path()
        if path is None:
            raise NotImplementedError(
                '2DFAN4 weights not found: set FVT_FAN_WEIGHTS or place '
                '2DFAN4-cd938726ad.zip in the torch-hub cache (the '
                'architecture itself is native — see preprocess/fan.py)')
        sd = self.load_weights(path)
        params, stats = port_torch_state_dict(sd)
        self.model = FAN()
        self.variables = {'params': params, 'batch_stats': stats}
        self._fwd = jax.jit(
            lambda v, x: self.model.apply(v, x))

    @staticmethod
    def load_weights(path: str) -> dict:
        """torch-hub zips need torch to deserialize; .npz works bare.

        The published ``2DFAN4-cd938726ad.zip`` is a TorchScript archive
        (face_alignment >=1.2 loads it with ``torch.jit.load``), which
        ``torch.load(weights_only=True)`` refuses outright — so try the
        jit loader first and fall back to a plain state-dict file."""
        if path.endswith('.npz'):
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        import torch  # torch (cpu) is available in this image
        try:
            sd = torch.jit.load(path, map_location='cpu').state_dict()
        except RuntimeError:  # not a TorchScript archive
            sd = torch.load(path, map_location='cpu', weights_only=True)
        return {k: v.cpu().numpy() for k, v in sd.items()}

    def predict(self, img_rgb: np.ndarray, bbox) -> np.ndarray:
        center, scale = bbox_to_center_scale(bbox)
        crop = crop_face(img_rgb.astype(np.float32), center, scale)
        # face_alignment's crop buffer is uint8 and cv2.resize emits
        # uint8 before the /255 normalize: quantize like it does (cv2's
        # fixed-point INTER_LINEAR differs from this float evaluation by
        # <=1 lsb on uint8-range inputs)
        crop = np.clip(np.rint(crop), 0.0, 255.0)
        x = jnp.asarray(crop[None] / 255.0, jnp.float32)
        hm = np.asarray(self._fwd(self.variables, x)[0])
        return decode_heatmaps(hm, center, scale)


def make_full_frame_landmarker(weights_path: Optional[str] = None):
    """Landmarker over ALREADY-CROPPED faces (the driver's landmark.npy
    chain step): the whole image is the face, so the FAN crop derives
    from the full-frame box.  The reference's FacenetController instead
    runs face_alignment.get_landmarks on its MTCNN crop, whose internal
    SFD box jitters the FAN window — outputs agree to a few px, not
    bit-exactly (video.py:249-292)."""
    fan = FANLandmarks(weights_path)

    def landmarker(img_rgb: np.ndarray) -> np.ndarray:
        h, w = img_rgb.shape[:2]
        return fan.predict(img_rgb, (0, 0, w, h))

    return landmarker


def extract_landmarks_68_native(img_rgb: np.ndarray,
                                detector=None,
                                fan: Optional[FANLandmarks] = None
                                ) -> np.ndarray:
    """Native 68-pt extraction: detector -> FAN (no torch packages in
    the compute path; mirrors faces.extract_landmarks_68's contract).

    Fidelity note: the reference's FaceAlignment detects the face box
    with its built-in SFD detector before cropping; this native path
    uses ``default_detector()`` (RetinaFace when weights are present).
    FAN's crop is box-derived (center/scale), so a slightly different
    box jitters the crop window — landmark outputs agree to a few px,
    not bit-exactly, with the package path."""
    if fan is None:
        fan = FANLandmarks()
    if detector is None:
        from fvt_tpu.preprocess.faces import default_detector
        detector = default_detector()
    dets = detector.detect(img_rgb)
    assert dets, 'no face found'
    return fan.predict(img_rgb, dets[0]['bbox'])
