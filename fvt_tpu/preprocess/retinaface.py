"""RetinaFace-ResNet50 face detector, JAX/flax port.

The reference's preprocessing quality hinges on the ternaus
``retinaface`` package (RetinaFace-R50,
/root/reference/abaw5_pre_processing/dlib/face_landmarks/retinaface_align.py:64-284);
this module re-implements the full inference network natively so
from-scratch preprocessing needs NO torch packages:

  * torchvision-style ResNet-50 trunk -> C3/C4/C5 feature maps;
  * FPN (256 ch) + SSH context modules on 3 levels;
  * 2-anchor class/bbox/landmark heads per level;
  * prior-box grid (min_sizes [[16,32],[64,128],[256,512]], steps
    [8,16,32]), variance [0.1, 0.2] box/landmark decode, greedy NMS;
  * the ternaus ``predict_jsons`` pre/post-processing contract:
    longest-side resize to ``max_size``, ImageNet normalization, pad to
    square, decode at padded scale, un-pad and rescale to the original
    frame (so crops are store-compatible with reference-preprocessed
    data).

Weights: :func:`port_torch_state_dict` converts the published
``retinaface_resnet50_2020-07-20.pth`` state dict (same file the
reference downloads to ``$TORCH_HOME/checkpoints``) to this model's
(params, batch_stats).  The checkpoint itself ships with neither this
image nor the reference repo — the loader accepts a path via
``FVT_RETINAFACE_WEIGHTS`` or the torch-hub default location.  The
architecture, prior/decode/NMS math, and the port's name/shape mapping
are pinned by tests/test_retinaface.py (synthetic state dict — no torch
needed).
"""
from __future__ import annotations

import math
import os
from itertools import product
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# ternaus cfg_re50 (retinaface/network.py)
MIN_SIZES = [[16, 32], [64, 128], [256, 512]]
STEPS = [8, 16, 32]
VARIANCES = (0.1, 0.2)
FPN_CH = 256
# albumentations Normalize defaults (ImageNet)
NORM_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
NORM_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ------------------------------------------------------------------ layers
class ConvBN(nn.Module):
    """conv + BN (+ optional LeakyReLU) — the conv_bn/conv_bn1X1/
    conv_bn_no_relu building blocks of retinaface/network.py."""
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    leaky: float = 0.0

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=pad, use_bias=False,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='bn')(x)
        if self.relu:
            x = jnp.where(x >= 0, x, x * self.leaky)
        return x


class TVBottleneck(nn.Module):
    """torchvision ResNet Bottleneck (1x1 -> 3x3 -> 1x1, expansion 4)."""
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      name='conv1')(x)
        out = nn.BatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5, name='bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=1, use_bias=False, name='conv2')(out)
        out = nn.BatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5, name='bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name='conv3')(out)
        out = nn.BatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5, name='bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=self.stride, use_bias=False,
                               name='down_conv')(x)
            identity = nn.BatchNorm(use_running_average=True,
                                    momentum=0.9, epsilon=1e-5,
                                    name='down_bn')(identity)
        return nn.relu(out + identity)


class TVResNet50(nn.Module):
    """torchvision resnet50 trunk returning (C3, C4, C5) =
    (layer2, layer3, layer4) outputs — the _utils.IntermediateLayerGetter
    contract of retinaface/network.py."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name='conv1')(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name='bn1')(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, 2, padding=1): pad with -inf, window 3
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        outs = []
        for li, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            for b in range(blocks):
                x = TVBottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    name=f'layer{li + 1}_{b}')(x)
            if li >= 1:
                outs.append(x)
        return tuple(outs)  # C3, C4, C5


class SSH(nn.Module):
    """SSH context module (retinaface/network.py::SSH)."""

    @nn.compact
    def __call__(self, x):
        c = FPN_CH
        c3 = ConvBN(c // 2, 3, relu=False, name='conv3X3')(x)
        c5_1 = ConvBN(c // 4, 3, name='conv5X5_1')(x)
        c5 = ConvBN(c // 4, 3, relu=False, name='conv5X5_2')(c5_1)
        c7_2 = ConvBN(c // 4, 3, name='conv7X7_2')(c5_1)
        c7 = ConvBN(c // 4, 3, relu=False, name='conv7x7_3')(c7_2)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class RetinaFaceNet(nn.Module):
    """Full detector: trunk -> FPN -> SSH -> per-level heads.

    Returns (loc (B, A, 4), conf (B, A, 2) softmaxed,
    landms (B, A, 10)) with anchors ordered level-major, then
    row-major spatial, then the 2 anchor sizes — matching PriorBox.
    """

    @nn.compact
    def __call__(self, x):
        c3, c4, c5 = TVResNet50(name='body')(x)

        o1 = ConvBN(FPN_CH, 1, name='fpn_output1')(c3)
        o2 = ConvBN(FPN_CH, 1, name='fpn_output2')(c4)
        o3 = ConvBN(FPN_CH, 1, name='fpn_output3')(c5)
        up3 = jax.image.resize(o3, o2.shape, method='nearest')
        o2 = ConvBN(FPN_CH, 3, name='fpn_merge2')(o2 + up3)
        up2 = jax.image.resize(o2, o1.shape, method='nearest')
        o1 = ConvBN(FPN_CH, 3, name='fpn_merge1')(o1 + up2)

        feats = [SSH(name=f'ssh{i + 1}')(f)
                 for i, f in enumerate((o1, o2, o3))]

        locs, confs, ldms = [], [], []
        for i, f in enumerate(feats):
            b = f.shape[0]
            loc = nn.Conv(2 * 4, (1, 1), name=f'bbox_head{i}')(f)
            conf = nn.Conv(2 * 2, (1, 1), name=f'class_head{i}')(f)
            ldm = nn.Conv(2 * 10, (1, 1), name=f'landmark_head{i}')(f)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, 2))
            ldms.append(ldm.reshape(b, -1, 10))
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
        ldm = jnp.concatenate(ldms, axis=1)
        return loc, conf, ldm


# ------------------------------------------------------------- prior/decode
def prior_boxes(height: int, width: int) -> np.ndarray:
    """(A, 4) [cx, cy, sx, sy] normalized anchors
    (retinaface/prior_box.py), level-major / row-major / size-minor."""
    anchors = []
    for k, step in enumerate(STEPS):
        fh = int(math.ceil(height / step))
        fw = int(math.ceil(width / step))
        for i, j in product(range(fh), range(fw)):
            for min_size in MIN_SIZES[k]:
                s_kx = min_size / width
                s_ky = min_size / height
                cx = (j + 0.5) * step / width
                cy = (i + 0.5) * step / height
                anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, dtype=np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """(A, 4) [x0, y0, x1, y1] normalized (retinaface/box_utils.decode)."""
    v0, v1 = VARIANCES
    centers = priors[:, :2] + loc[:, :2] * v0 * priors[:, 2:]
    sizes = priors[:, 2:] * np.exp(loc[:, 2:] * v1)
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1)
    return boxes


def decode_landmarks(ldm: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """(A, 5, 2) normalized (retinaface/box_utils.decode_landm)."""
    v0 = VARIANCES[0]
    pts = [priors[:, :2] + ldm[:, 2 * i:2 * i + 2] * v0 * priors[:, 2:]
           for i in range(5)]
    return np.stack(pts, axis=1)


def nms(boxes: np.ndarray, scores: np.ndarray, threshold: float
        ) -> List[int]:
    """Greedy IoU NMS (torchvision semantics: no +1 in areas)."""
    order = np.argsort(-scores)
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xa = np.maximum(x0[i], x0[rest])
        ya = np.maximum(y0[i], y0[rest])
        xb = np.minimum(x1[i], x1[rest])
        yb = np.minimum(y1[i], y1[rest])
        inter = np.maximum(xb - xa, 0) * np.maximum(yb - ya, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-12)
        order = rest[iou <= threshold]
    return keep


# --------------------------------------------------------------- weight port
from fvt_tpu.preprocess.torch_port import (torch_bn as _tv_bn,
                                            torch_conv as _tv_conv)


def _convbn(sd, p, params, stats, name, conv_idx=0, bn_idx=1):
    params[name] = {'conv': _tv_conv(sd, f'{p}.{conv_idx}')}
    bnp, bns = _tv_bn(sd, f'{p}.{bn_idx}')
    params[name]['bn'] = bnp
    stats[name] = {'bn': bns}


def port_torch_state_dict(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """ternaus retinaface_resnet50 state dict -> (params, batch_stats)
    for :class:`RetinaFaceNet`.  Accepts plain numpy arrays (tests) or
    torch tensors."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, 'detach') else
              np.asarray(v)) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    # trunk
    body_p: dict = {'conv1': _tv_conv(sd, 'body.conv1')}
    body_s: dict = {}
    bnp, bns = _tv_bn(sd, 'body.bn1')
    body_p['bn1'], body_s['bn1'] = bnp, bns
    for li, blocks in enumerate([3, 4, 6, 3]):
        for b in range(blocks):
            base = f'body.layer{li + 1}.{b}'
            blk: dict = {}
            blk_s: dict = {}
            for ci in (1, 2, 3):
                blk[f'conv{ci}'] = _tv_conv(sd, f'{base}.conv{ci}')
                p, s = _tv_bn(sd, f'{base}.bn{ci}')
                blk[f'bn{ci}'], blk_s[f'bn{ci}'] = p, s
            if f'{base}.downsample.0.weight' in sd:
                blk['down_conv'] = _tv_conv(sd, f'{base}.downsample.0')
                p, s = _tv_bn(sd, f'{base}.downsample.1')
                blk['down_bn'], blk_s['down_bn'] = p, s
            body_p[f'layer{li + 1}_{b}'] = blk
            body_s[f'layer{li + 1}_{b}'] = blk_s
    params['body'], stats['body'] = body_p, body_s

    # FPN: output1/2/3 + merge1/2 are nn.Sequential(conv, bn, leaky)
    for name in ('output1', 'output2', 'output3', 'merge1', 'merge2'):
        _convbn(sd, f'fpn.{name}', params, stats, f'fpn_{name}')

    # SSH: each sub-block is Sequential(conv, bn[, leaky])
    for i in (1, 2, 3):
        ssh_p: dict = {}
        ssh_s: dict = {}
        for sub in ('conv3X3', 'conv5X5_1', 'conv5X5_2', 'conv7X7_2',
                    'conv7x7_3'):
            _convbn(sd, f'ssh{i}.{sub}', ssh_p, ssh_s, sub)
        params[f'ssh{i}'], stats[f'ssh{i}'] = ssh_p, ssh_s

    # heads: ModuleList of 3, each a single conv1x1 WITH bias
    for tname, fname in (('BboxHead', 'bbox_head'),
                         ('ClassHead', 'class_head'),
                         ('LandmarkHead', 'landmark_head')):
        for i in range(3):
            p = f'{tname}.{i}.conv1x1'
            params[f'{fname}{i}'] = {
                'kernel': np.asarray(sd[f'{p}.weight'],
                                     np.float32).transpose(2, 3, 1, 0),
                'bias': np.asarray(sd[f'{p}.bias'], np.float32)}

    return params, stats


def expected_state_dict_shapes() -> Dict[str, tuple]:
    """Torch-layout key -> shape map of the published checkpoint — the
    port's contract, used by tests to synthesize a state dict without
    torch/torchvision present."""
    shapes: Dict[str, tuple] = {'body.conv1.weight': (64, 3, 7, 7)}

    def bn(p, c):
        shapes[f'{p}.weight'] = (c,)
        shapes[f'{p}.bias'] = (c,)
        shapes[f'{p}.running_mean'] = (c,)
        shapes[f'{p}.running_var'] = (c,)

    bn('body.bn1', 64)
    in_c = 64
    for li, (planes, blocks) in enumerate([(64, 3), (128, 4),
                                           (256, 6), (512, 3)]):
        for b in range(blocks):
            base = f'body.layer{li + 1}.{b}'
            shapes[f'{base}.conv1.weight'] = (planes, in_c, 1, 1)
            bn(f'{base}.bn1', planes)
            shapes[f'{base}.conv2.weight'] = (planes, planes, 3, 3)
            bn(f'{base}.bn2', planes)
            shapes[f'{base}.conv3.weight'] = (planes * 4, planes, 1, 1)
            bn(f'{base}.bn3', planes * 4)
            if b == 0:
                shapes[f'{base}.downsample.0.weight'] = \
                    (planes * 4, in_c, 1, 1)
                bn(f'{base}.downsample.1', planes * 4)
            in_c = planes * 4

    for name, cin, k in (('output1', 512, 1), ('output2', 1024, 1),
                         ('output3', 2048, 1), ('merge1', FPN_CH, 3),
                         ('merge2', FPN_CH, 3)):
        shapes[f'fpn.{name}.0.weight'] = (FPN_CH, cin, k, k)
        bn(f'fpn.{name}.1', FPN_CH)

    for i in (1, 2, 3):
        for sub, cin, cout in (
                ('conv3X3', FPN_CH, FPN_CH // 2),
                ('conv5X5_1', FPN_CH, FPN_CH // 4),
                ('conv5X5_2', FPN_CH // 4, FPN_CH // 4),
                ('conv7X7_2', FPN_CH // 4, FPN_CH // 4),
                ('conv7x7_3', FPN_CH // 4, FPN_CH // 4)):
            shapes[f'ssh{i}.{sub}.0.weight'] = (cout, cin, 3, 3)
            bn(f'ssh{i}.{sub}.1', cout)

    for tname, cout in (('BboxHead', 8), ('ClassHead', 4),
                        ('LandmarkHead', 20)):
        for i in range(3):
            shapes[f'{tname}.{i}.conv1x1.weight'] = (cout, FPN_CH, 1, 1)
            shapes[f'{tname}.{i}.conv1x1.bias'] = (cout,)
    return shapes


# ------------------------------------------------------------- the detector
def _default_weights_path() -> Optional[str]:
    env = os.environ.get('FVT_RETINAFACE_WEIGHTS')
    if env:
        # an explicitly-set path must not silently degrade to the
        # Haar/center-box fallback chain (faces.default_detector
        # catches per-factory exceptions) — fail loudly here instead
        if not os.path.isfile(env):
            raise FileNotFoundError(
                f'FVT_RETINAFACE_WEIGHTS is set but no file exists at '
                f'{env!r}')
        return env
    hub = os.environ.get('TORCH_HOME',
                         os.path.expanduser('~/.cache/torch'))
    p = os.path.join(hub, 'hub', 'checkpoints',
                     'retinaface_resnet50_2020-07-20.pth')
    return p if os.path.isfile(p) else None


class RetinaFaceJAX:
    """Native detector behind the faces.py contract:
    ``detect(img_rgb) -> [{'bbox', 'score', 'landmarks'}, ...]`` sorted
    by score — the same output surface as the reference's
    ``predict_jsons`` consumer (retinaface_align.py:183-237).
    """

    def __init__(self, confidence_threshold: float = 0.9,
                 nms_threshold: float = 0.4, max_size: int = 2048,
                 variables: Optional[dict] = None,
                 weights_path: Optional[str] = None):
        self.threshold = confidence_threshold
        self.nms_threshold = nms_threshold
        self.max_size = max_size
        self.model = RetinaFaceNet()

        if variables is None:
            path = weights_path or _default_weights_path()
            if path is None:
                raise FileNotFoundError(
                    'RetinaFace weights not found: set '
                    'FVT_RETINAFACE_WEIGHTS or place '
                    'retinaface_resnet50_2020-07-20.pth under '
                    '$TORCH_HOME/hub/checkpoints (the same file the '
                    'reference downloads)')
            variables = self.load_weights(path)
        self.variables = variables
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x))
        self._priors: Dict[Tuple[int, int], np.ndarray] = {}

    @staticmethod
    def load_weights(path: str) -> dict:
        # torch.load unconditionally: the published
        # retinaface_resnet50_2020-07-20.pth may predate torch 1.6's zip
        # serialization, and a plain pickle.load of that legacy
        # multi-object stream returns its magic-number int, not the
        # state dict. torch handles both formats.
        import torch
        sd = torch.load(path, map_location='cpu', weights_only=True)
        if isinstance(sd, dict) and 'state_dict' in sd:
            sd = sd['state_dict']
        params, stats = port_torch_state_dict(sd)
        return {'params': params, 'batch_stats': stats}

    # -- preprocessing (ternaus predict_jsons contract) ----------------
    def _prepare(self, img_rgb: np.ndarray
                 ) -> Tuple[np.ndarray, int, int]:
        """Returns (padded normalized image, top pad, left pad); the
        inverse mapping in postprocess_detections needs only the pads —
        its resize_coeff = max(h, w) / max_size re-derives the scale."""
        h, w = img_rgb.shape[:2]
        scale = self.max_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        if (nh, nw) != (h, w):
            # rectangular separable resize with the shared antialiased
            # triangle kernel (host_resize.resize_weights)
            from fvt_tpu.data.host_resize import resize_weights
            wh = resize_weights(h, nh).astype(np.float32)
            ww = resize_weights(w, nw).astype(np.float32)
            tmp = np.tensordot(wh, img_rgb.astype(np.float32),
                               axes=(1, 0))          # (nh, w, c)
            img = np.tensordot(tmp, ww, axes=(1, 1))  # (nh, c, nw)
            img = np.clip(np.rint(img.transpose(0, 2, 1)), 0,
                          255).astype(np.uint8)
        else:
            img = img_rgb
        x = (img.astype(np.float32) / 255.0 - NORM_MEAN) / NORM_STD
        # CENTER pad, like ternaus predict_jsons (pad_to_size computes
        # min_pad = (target - size) // 2 and unpad_from_size subtracts
        # it) — a corner pad would shift content by a non-multiple of
        # the stride-32 grid vs the reference and perturb sub-stride
        # box/landmark alignment near borders
        pad_h = self.max_size - nh
        pad_w = self.max_size - nw
        top, left = pad_h // 2, pad_w // 2
        x = np.pad(x, ((top, pad_h - top), (left, pad_w - left), (0, 0)))
        return x, top, left

    def detect(self, img_rgb: np.ndarray) -> List[dict]:
        h, w = img_rgb.shape[:2]
        x, top, left = self._prepare(img_rgb)
        size = x.shape[0]
        loc_d, conf_d, ldm_d = self._fwd(self.variables,
                                         jnp.asarray(x[None]))
        # D2H discipline: pull only the score column first (~0.7 MB at
        # 512^2), threshold on host, then gather the few kept rows on
        # device — NOT the full loc/ldm tensors (~11 MB/frame, which on
        # the axon tunnel costs more than the whole forward)
        scores = np.asarray(conf_d[0][:, 1])

        key = (size, size)
        if key not in self._priors:
            self._priors[key] = prior_boxes(size, size)
        priors = self._priors[key]

        keep = scores > self.threshold
        if not keep.any():
            return []
        sel = jnp.asarray(np.nonzero(keep)[0])
        locldm = np.asarray(jnp.concatenate(
            [loc_d[0][sel], ldm_d[0][sel]], axis=1))
        boxes = decode_boxes(locldm[:, :4], priors[keep]) * size
        lands = decode_landmarks(locldm[:, 4:], priors[keep]) * size
        scores = scores[keep]

        kept = nms(boxes, scores, self.nms_threshold)
        out = postprocess_detections(boxes, lands, scores, kept,
                                     left, top, self.max_size, h, w)
        out.sort(key=lambda d: d['score'], reverse=True)
        return out


def postprocess_detections(boxes: np.ndarray, lands: np.ndarray,
                           scores: np.ndarray, kept: List[int],
                           left: int, top: int, max_size: int,
                           h: int, w: int) -> List[dict]:
    """ternaus ``predict_jsons`` output semantics, exactly:

      * boxes are truncated to int AT THE PADDED SCALE
        (``boxes[keep].int()``), un-padded, rescaled by
        ``resize_coeff = max(h, w) / max_size`` and truncated to int
        AGAIN (``.astype(int)``);
      * landmarks are un-padded as float, rescaled, truncated to int
        ONCE;
      * box corners are clipped with the reference's asymmetric
        convention (``x_max`` to ``[x_min + 1, w - 1]``).

    The double truncation loses sub-pixel precision on purpose: the
    reference's stores were built from these integer coordinates
    (retinaface_align.py:204-207 consumes them verbatim), and the
    5-point warp is exactly reproducible only from the same integers.
    """
    resize_coeff = max(h, w) / max_size
    unpad_b = np.array([left, top, left, top])
    unpad_l = np.array([left, top], np.float32)
    out = []
    for i in kept:
        b = boxes[i].astype(int)                      # trunc @ padded
        b = ((b - unpad_b) * resize_coeff).astype(int)  # trunc @ frame
        l5 = ((lands[i] - unpad_l) * resize_coeff).astype(int)
        x_min = int(np.clip(b[0], 0, w - 1))
        x_max = int(np.clip(b[2], x_min + 1, w - 1))
        y_min = int(np.clip(b[1], 0, h - 1))
        y_max = int(np.clip(b[3], y_min + 1, h - 1))
        out.append({'bbox': np.array([x_min, y_min, x_max, y_max], float),
                    'score': float(scores[i]),
                    'landmarks': l5.astype(np.float32)})
    return out
