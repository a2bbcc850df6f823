"""ArcFace ir-ResNet-50 visual backbone (frozen feature extractor).

TPU re-implementation of /root/reference/models/arcface_model.py:44-151 +
models/backbone.py:69-126: input (N, 40, 40, 3) face crops -> l2-normalized
512-d embeddings.  NHWC layout end-to-end; weights port from the torch
``res50_ir_0.887.pth`` checkpoint via :func:`visual_backbone_from_torch`.

This is the hot op of the whole pipeline (B*T frames per step); bf16-ready:
pass ``compute_dtype=jnp.bfloat16`` to run conv/matmul in bf16 on the MXU
with fp32 batch-norm statistics.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from fvt_tpu.models.layers import PReLU, TorchEMABatchNorm


class Conv3x3(nn.Module):
    """3x3 'same' conv with a selectable compute path.

    Param tree ({'kernel': (3, 3, Cin, Cout)}) and initialization match
    ``nn.Conv(use_bias=False)`` exactly, so torch-ported checkpoints and
    existing orbax checkpoints load unchanged.  ``impl``:

      * ``'xla'``             — lax direct convolution (default).
      * ``'int8'``            — weight+activation int8 on the MXU's
                                double-rate path (ops/quant.py);
                                serving only, changes numerics.
      * ``'winograd'``        — F(2x2,3x3) transform-domain matmuls
                                (ops/winograd.py), stride-1 only.
      * ``'winograd_pallas'`` — fused-VMEM Winograd kernel.

    Winograd reorders additions (2.25x fewer multiplies); parity vs the
    direct conv is pinned in tests/test_winograd.py.
    """
    features: int
    stride: int = 1
    impl: str = 'xla'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        if self.impl == 'int8' and x.shape[-1] >= 128:
            # Cin<128 (stage 1, 64-ch) stays bf16: the round-3 ablation
            # (ops/quant.py docstring) measured int8 1.2-1.4x FASTER at
            # the 128/256/512-ch stages but ~equal-to-slower at 64 ch,
            # where int8 tiling can't fill the MXU better than bf16.
            from fvt_tpu.ops.quant import conv3x3_int8
            x_scale = None
            if self.is_mutable_collection('act_scales') \
                    and not self.is_initializing():
                # calibration pass (--serve_quant int8_static): record
                # the running max|x| across calibration batches; the
                # output itself still uses the dynamic scale
                self.sow('act_scales', 'amax',
                         jnp.max(jnp.abs(x.astype(jnp.float32))),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros(()))
            elif self.has_variable('act_scales', 'amax'):
                # static path: calibrated amax provided at apply time —
                # no per-batch reduction pass over the activations
                amax = self.get_variable('act_scales', 'amax')
                x_scale = jnp.maximum(amax, 1e-12) / 127.0
            return conv3x3_int8(x, kernel, stride=self.stride,
                                out_dtype=self.dtype, x_scale=x_scale)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.stride == 1 and self.impl not in ('xla', 'int8'):
            from fvt_tpu.ops import winograd
            if self.impl == 'winograd':
                return winograd.conv3x3_winograd(x, kernel)
            if self.impl == 'winograd_pallas':
                return winograd.conv3x3_winograd_pallas(x, kernel)
            raise ValueError(f'unknown conv impl: {self.impl!r}')
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def get_blocks_50() -> List[Tuple[int, int, int]]:
    """(in_channel, depth, stride) per bottleneck (arcface_model.py:91-102)."""
    blocks = []
    for in_c, depth, num_units, stride in [(64, 64, 3, 1), (64, 128, 4, 2),
                                           (128, 256, 14, 2),
                                           (256, 512, 3, 2)]:
        blocks.append((in_c, depth, stride))
        blocks.extend([(depth, depth, 1)] * (num_units - 1))
    return blocks


class BottleneckIR(nn.Module):
    """BN -> 3x3 conv -> PReLU -> 3x3 strided conv -> BN, + shortcut."""
    in_channel: int
    depth: int
    stride: int
    dtype: Any = jnp.float32
    conv_impl: str = 'xla'

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.in_channel == self.depth:
            shortcut = x[:, ::self.stride, ::self.stride, :]  # MaxPool2d(1,s)
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name='shortcut_conv')(x)
            shortcut = TorchEMABatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype,
                                    name='shortcut_bn')(shortcut)

        res = TorchEMABatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        res = Conv3x3(self.depth, stride=1, impl=self.conv_impl,
                      dtype=self.dtype, name='conv1')(res)
        res = PReLU(self.depth, name='prelu')(res)
        res = Conv3x3(self.depth, stride=self.stride, impl=self.conv_impl,
                      dtype=self.dtype, name='conv2')(res)
        res = TorchEMABatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name='bn2')(res)
        return res + shortcut


class ArcFaceBackbone(nn.Module):
    """Backbone(num_layers=50, mode='ir') with the 5x5 output layer
    (backbone.py:99-103): 40x40 input -> 512-d l2-normed embedding."""
    drop_ratio: float = 0.4
    dtype: Any = jnp.float32
    conv_impl: str = 'xla'

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        # input conv keeps the direct path: Cin=3 is a terrible matmul K
        x = nn.Conv(64, (3, 3), strides=1, padding=1, use_bias=False,
                    dtype=self.dtype, name='input_conv')(x)
        x = TorchEMABatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='input_bn')(x)
        x = PReLU(64, name='input_prelu')(x)

        for i, (in_c, depth, stride) in enumerate(get_blocks_50()):
            x = BottleneckIR(in_c, depth, stride, dtype=self.dtype,
                             conv_impl=self.conv_impl,
                             name=f'body{i}')(x, train=train)

        x = TorchEMABatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='output_bn2d')(x)
        x = nn.Dropout(self.drop_ratio, deterministic=not train)(x)
        x = x.reshape(x.shape[0], -1)  # NHWC flatten
        x = x.astype(jnp.float32)
        x = nn.Dense(512, name='output_linear')(x)
        x = TorchEMABatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='output_bn1d')(x)

        norm = jnp.linalg.norm(x, ord=2, axis=1, keepdims=True)
        return x / norm


class VisualBackbone(nn.Module):
    """Wrapper matching backbone.py:69-130 (extract() == forward())."""
    dtype: Any = jnp.float32
    conv_impl: str = 'xla'

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return ArcFaceBackbone(dtype=self.dtype, conv_impl=self.conv_impl,
                               name='backbone')(x, train=train)


# ------------------------------------------------- fused serving forward
def arcface_forward_eval(params: dict, stats: dict, x: jnp.ndarray,
                         dtype: Any = jnp.bfloat16,
                         fused_blocks: bool = False,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Functional eval-mode VisualBackbone forward over plain
    (params, batch_stats) dicts — same math as
    ``VisualBackbone.apply(..., train=False)`` (pinned in
    tests/test_bottleneck_pallas.py), with the stride-1 identity
    bottlenecks routed through the fused whole-block Pallas kernel
    (ops/bottleneck_pallas.py) when ``fused_blocks``.  Default OFF:
    the fused kernel measured ~2x SLOWER than XLA at every stage on
    real v5e (full ablation in the bottleneck_pallas docstring) — it
    survives here only so the profiler can reproduce the table.

    Functional on purpose: flax scopes own the per-submodule params, so
    a whole-block kernel cannot be expressed inside ``@nn.compact``
    without restructuring the param tree that torch-ported/orbax
    checkpoints depend on.
    """
    from fvt_tpu.ops.bottleneck_pallas import (bottleneck_ir_fused,
                                               bn_affine)

    p = params['backbone']
    s = stats['backbone']

    def conv(v, kernel, stride, pad=1):
        return jax.lax.conv_general_dilated(
            v, kernel.astype(v.dtype), (stride, stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def bn(v, name, pp, ss):
        a, b = bn_affine(pp[name], ss[name])
        return (v.astype(jnp.float32) * a + b).astype(v.dtype)

    def prelu(v, alpha):
        return jnp.where(v >= 0, v, v * alpha.astype(v.dtype))

    x = x.astype(dtype)
    x = conv(x, p['input_conv']['kernel'], 1)
    x = bn(x, 'input_bn', p, s)
    x = prelu(x, p['input_prelu']['alpha'])

    for i, (in_c, depth, stride) in enumerate(get_blocks_50()):
        bp, bs = p[f'body{i}'], s[f'body{i}']
        if fused_blocks and stride == 1 and in_c == depth:
            h = x.shape[1]
            tile = max(4, min(64, (8 * 40 * 40 * 64)
                              // (h * h * depth)))
            x = bottleneck_ir_fused(x, bp, bs, batch_tile=tile,
                                    interpret=interpret)
            continue
        if in_c == depth:
            shortcut = x[:, ::stride, ::stride, :]
        else:
            shortcut = conv(x, bp['shortcut_conv']['kernel'], stride,
                            pad=0)
            shortcut = bn(shortcut, 'shortcut_bn', bp, bs)
        res = bn(x, 'bn1', bp, bs)
        res = conv(res, bp['conv1']['kernel'], 1)
        res = prelu(res, bp['prelu']['alpha'])
        res = conv(res, bp['conv2']['kernel'], stride)
        res = bn(res, 'bn2', bp, bs)
        x = res + shortcut

    x = bn(x, 'output_bn2d', p, s)
    # eval-mode dropout is identity
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    k = p['output_linear']
    x = x @ k['kernel'] + k['bias']
    a, b = bn_affine(p['output_bn1d'], s['output_bn1d'])
    x = x * a + b
    norm = jnp.linalg.norm(x, ord=2, axis=1, keepdims=True)
    return x / norm


# --------------------------------------------------------------- weight port
def _np(x):
    import numpy as np
    if hasattr(x, 'detach'):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv(sd, prefix):
    # torch OIHW -> flax HWIO
    return {'kernel': _np(sd[f'{prefix}.weight']).transpose(2, 3, 1, 0)}


def _bn(sd, prefix):
    params = {'scale': _np(sd[f'{prefix}.weight']),
              'bias': _np(sd[f'{prefix}.bias'])}
    stats = {'mean': _np(sd[f'{prefix}.running_mean']),
             'var': _np(sd[f'{prefix}.running_var'])}
    return params, stats


def _prelu(sd, prefix):
    return {'alpha': _np(sd[f'{prefix}.weight'])}


def arcface_from_torch(sd: dict, prefix: str = 'backbone'
                       ) -> Tuple[dict, dict]:
    """Convert a VisualBackbone torch state_dict (backbone.py layout:
    input_layer.{0,1,2}, body.{i}.{shortcut_layer,res_layer}, output_layer)
    to (params, batch_stats) for :class:`ArcFaceBackbone`."""
    import numpy as np

    params: dict = {}
    stats: dict = {}

    params['input_conv'] = _conv(sd, f'{prefix}.input_layer.0')
    p, s = _bn(sd, f'{prefix}.input_layer.1')
    params['input_bn'], stats['input_bn'] = p, s
    params['input_prelu'] = _prelu(sd, f'{prefix}.input_layer.2')

    for i, (in_c, depth, stride) in enumerate(get_blocks_50()):
        blk: dict = {}
        blk_stats: dict = {}
        base = f'{prefix}.body.{i}'
        if in_c != depth:
            blk['shortcut_conv'] = _conv(sd, f'{base}.shortcut_layer.0')
            p, s = _bn(sd, f'{base}.shortcut_layer.1')
            blk['shortcut_bn'], blk_stats['shortcut_bn'] = p, s
        p, s = _bn(sd, f'{base}.res_layer.0')
        blk['bn1'], blk_stats['bn1'] = p, s
        blk['conv1'] = _conv(sd, f'{base}.res_layer.1')
        blk['prelu'] = _prelu(sd, f'{base}.res_layer.2')
        blk['conv2'] = _conv(sd, f'{base}.res_layer.3')
        p, s = _bn(sd, f'{base}.res_layer.4')
        blk['bn2'], blk_stats['bn2'] = p, s
        params[f'body{i}'] = blk
        stats[f'body{i}'] = blk_stats

    p, s = _bn(sd, f'{prefix}.output_layer.0')
    params['output_bn2d'], stats['output_bn2d'] = p, s
    # torch flattens NCHW (c*25 + h*5 + w); we flatten NHWC
    w = _np(sd[f'{prefix}.output_layer.3.weight'])  # (512, 512*5*5)
    w = w.reshape(512, 512, 5, 5).transpose(0, 2, 3, 1).reshape(512, -1)
    params['output_linear'] = {
        'kernel': w.T, 'bias': _np(sd[f'{prefix}.output_layer.3.bias'])}
    p, s = _bn(sd, f'{prefix}.output_layer.4')
    params['output_bn1d'], stats['output_bn1d'] = p, s

    return params, stats


def visual_backbone_from_torch(sd: dict) -> Tuple[dict, dict]:
    """(params, batch_stats) for :class:`VisualBackbone` from the torch
    VisualBackbone state_dict (keys rooted at 'backbone.')."""
    params, stats = arcface_from_torch(sd, prefix='backbone')
    return {'backbone': params}, {'backbone': stats}
