"""The four fusion architectures: LFAN, CAN, JMT, MT.

TPU re-designs of /root/reference/models/model.py:375-526 (LFAN), :571-684
(CAN), :1051-1167 (JMT/MT).  Differences from the reference that are pure
layout (not math): activations are feature-last (B, T, C); raw-video /
raw-logmel inputs are channel-last.

All models output per-frame logits (B, T, num_classes).  `train=True`
enables dropout + batch-stat batchnorm (needs 'dropout' rng and mutable
['batch_stats']).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from fvt_tpu import constants
from fvt_tpu.config import model_config as MC
from fvt_tpu.models.tcn import TemporalConvNet
from fvt_tpu.models.layers import TorchBatchNorm, TorchLinear
from fvt_tpu.models.fusion import (
    MultimodalTransformerEncoder, AttentionFusion, JMTFusion, MTFusion)


def _maybe_encode_spatial(self, x: Dict[str, jnp.ndarray], train: bool
                          ) -> Dict[str, jnp.ndarray]:
    """Run frozen spatial backbones over raw video / logmel streams.

    'video' (B, T, H, W, 3) -> (B, T, 512) through ArcFace ResNet-50;
    'logmel' (B, T, 96, 64) -> (B, T, 128) through VGGish.  Precomputed
    feature inputs (B, T, D) pass through untouched.
    """
    out = dict(x)
    # train propagates INTO the frozen encoders: the reference's
    # model.train() puts them in train mode too (batch-stat BN with
    # running-stat updates, active dropout) even though their params
    # never receive gradients (trainer.py:318, no submodule .eval()).
    # --frozen_eval_backbones (opt-in, DIVERGES from that contract):
    # run them eval-mode during training — running-stat BN, no dropout,
    # frozen batch_stats — trading exact reference train dynamics for
    # a measurably cheaper step (the batch-stat reductions + stat
    # updates on the 2400-frame backbone pass are pure overhead when
    # the params never move)
    enc_train = train and not getattr(self, 'frozen_eval', False)
    if 'video' in out and out['video'].ndim == 5:
        if self.spatial_video is None:
            raise ValueError(
                "raw (B, T, H, W, C) video input requires a "
                "spatial_video backbone (registry.init_model wires the "
                "ArcFace encoder for the 'video' modality); got None — "
                "this model was built for precomputed features")
        b, t = out['video'].shape[:2]
        frames = out['video'].reshape((b * t,) + out['video'].shape[2:])
        feats = self.spatial_video(frames, train=enc_train)
        out['video'] = feats.reshape(b, t, -1)
    if 'logmel' in out and out['logmel'].ndim == 4:
        if self.spatial_audio is None:
            raise ValueError(
                "raw (B, T, 96, 64) logmel input requires a "
                "spatial_audio backbone (registry.init_model wires the "
                "VGGish encoder for the 'logmel' modality); got None — "
                "this model was built for precomputed features")
        b, t = out['logmel'].shape[:2]
        patches = out['logmel'].reshape((b * t,) + out['logmel'].shape[2:])
        feats = self.spatial_audio(patches, train=enc_train)
        out['logmel'] = feats.reshape(b, t, -1)
    return out


class LFAN(nn.Module):
    """Leader-follower attention network (model.py:375-526).

    leader = modality[0]; follower = multimodal attention fusion;
    head = Linear(encoder_dim[leader] + modal_dim * n_modal -> output_dim).
    """
    modality: Sequence[str]
    output_dim: int
    task: str = constants.CLASSIFICATION
    kernel_size: int = 5
    tcn_channel: Optional[Dict[str, Sequence[int]]] = None
    embedding_dim: Optional[Dict[str, int]] = None
    encoder_dim: Optional[Dict[str, int]] = None
    modal_dim: int = 32
    num_heads: int = 2
    tcn_dropout: float = 0.1
    fusion_dropout: float = 0.1
    tcn_fused: bool = False  # fused Pallas TCN blocks (fwd + custom VJP)
    spatial_video: Optional[nn.Module] = None
    spatial_audio: Optional[nn.Module] = None
    frozen_eval: bool = False  # --frozen_eval_backbones (see
    # _maybe_encode_spatial: opt-in eval-mode frozen encoders in train)

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray], *, train: bool = False):
        tcn_channel = self.tcn_channel or MC.TCN_CHANNELS
        encoder_dim = self.encoder_dim or MC.ENCODER_DIM

        x = _maybe_encode_spatial(self, x, train)

        feats = {}
        for modal in self.modality:
            if self.embedding_dim is not None:
                # validation only: the TCN infers its input width from
                # the data (torch sizes it from this dict, model.py:407)
                assert x[modal].shape[-1] == self.embedding_dim[modal], (
                    f"{modal}: feature dim {x[modal].shape[-1]} != "
                    f"embedding_dim {self.embedding_dim[modal]}")
            h = TemporalConvNet(tcn_channel[modal],
                                kernel_size=self.kernel_size,
                                dropout=self.tcn_dropout,
                                fused=self.tcn_fused,
                                name=f'temporal_{modal}')(
                x[modal], train=train)
            feats[modal] = TorchBatchNorm(
                use_running_average=not train, name=f'bn_{modal}')(h)

        follower = MultimodalTransformerEncoder(
            tuple(self.modality),
            {m: encoder_dim[m] for m in self.modality},
            self.modal_dim, self.num_heads, dropout=self.fusion_dropout,
            name='fusion')(feats, train=train)

        leader = self.modality[0]
        out = jnp.concatenate([feats[leader], follower], axis=-1)
        out = TorchLinear(self.output_dim, name='regressor')(out)
        if self.task == constants.REGRESSION:
            out = jnp.tanh(out)
        return out


class CAN(nn.Module):
    """Gated attention fusion network (model.py:571-684).

    ``tcn_dropout=None`` keeps the reference default (TemporalConvNet's
    0.2, temporal_convolutional_model.py:13); the override exists for
    deterministic lockstep-equivalence runs (tools/twin_train.py).
    """
    modality: Sequence[str]
    output_dim: int
    task: str = constants.CLASSIFICATION
    tcn_settings: Optional[Dict[str, Any]] = None
    tcn_dropout: Optional[float] = None
    spatial_video: Optional[nn.Module] = None
    spatial_audio: Optional[nn.Module] = None
    frozen_eval: bool = False  # --frozen_eval_backbones (see
    # _maybe_encode_spatial: opt-in eval-mode frozen encoders in train)

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray], *, train: bool = False):
        settings = self.tcn_settings or MC.TCN_SETTINGS

        x = _maybe_encode_spatial(self, x, train)

        feats = {}
        for modal in self.modality:
            h = TemporalConvNet(settings[modal]['channel'],
                                kernel_size=settings[modal]['kernel_size'],
                                dropout=(0.2 if self.tcn_dropout is None
                                         else self.tcn_dropout),
                                name=f'temporal_{modal}')(
                x[modal], train=train)
            feats[modal] = TorchBatchNorm(
                use_running_average=not train, name=f'bn_{modal}')(h)

        c = AttentionFusion(tuple(self.modality), num_out_feats=128,
                            name='fuse')(feats)
        c = TorchLinear(c.shape[-1], name='fc1')(c)
        c = TorchBatchNorm(use_running_average=not train, name='bn1')(c)
        c = jax.nn.leaky_relu(c, negative_slope=0.01)
        c = TorchLinear(self.output_dim, name='fc2')(c)
        if self.task == constants.REGRESSION:
            c = jnp.tanh(c)
        return c


class JMT(nn.Module):
    """Joint multimodal transformer (model.py:1051-1167).

    model_name selects JMTFusion (6-way cross-attention over visual/audio/
    joint encodings) or MTFusion (2-way).  Requires 'video' and 'vggish'
    streams.  ``time_mask`` (B, T) marks valid frames so right-padded
    fixed-shape eval matches the reference's ragged bs=1 eval.
    """
    modality: Sequence[str]
    output_dim: int
    model_name: str = constants.JMT
    task: str = constants.CLASSIFICATION
    tcn_settings: Optional[Dict[str, Any]] = None
    tcn_dropout: Optional[float] = None  # None = reference default 0.2;
    # override for deterministic lockstep runs (tools/twin_train.py)
    spatial_video: Optional[nn.Module] = None
    spatial_audio: Optional[nn.Module] = None
    frozen_eval: bool = False  # --frozen_eval_backbones (see
    # _maybe_encode_spatial: opt-in eval-mode frozen encoders in train)

    @nn.compact
    def __call__(self, x: Dict[str, jnp.ndarray], *, train: bool = False,
                 time_mask: Optional[jnp.ndarray] = None):
        settings = self.tcn_settings or MC.TCN_SETTINGS

        x = _maybe_encode_spatial(self, x, train)

        feats = {}
        for modal in self.modality:
            h = TemporalConvNet(settings[modal]['channel'],
                                kernel_size=settings[modal]['kernel_size'],
                                dropout=(0.2 if self.tcn_dropout is None
                                         else self.tcn_dropout),
                                name=f'temporal_{modal}')(
                x[modal], train=train)
            feats[modal] = TorchBatchNorm(
                use_running_average=not train, name=f'bn_{modal}')(h)

        if self.model_name == constants.JMT:
            fuse = JMTFusion(name='fuse')
        elif self.model_name == constants.MT:
            fuse = MTFusion(name='fuse')
        else:
            raise NotImplementedError(self.model_name)

        c = fuse(feats['video'], feats['vggish'], time_mask=time_mask)
        c = TorchLinear(128, name='fc1')(c)
        c = TorchBatchNorm(use_running_average=not train, name='bn1')(c)
        c = jax.nn.leaky_relu(c, negative_slope=0.01)
        c = TorchLinear(self.output_dim, name='fc2')(c)
        if self.task == constants.REGRESSION:
            c = jnp.tanh(c)
        return c
