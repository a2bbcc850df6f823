"""Jitted train / eval steps and the train state.

The hot loop of /root/reference/trainer.py:315-434 as one fused XLA program:
forward (+ batch-stat update), CE over B*T frames, backward, optimizer
update.  The "AMP" analogue on TPU: matmuls/convs ride the MXU in bf16 by
default precision while params/loss stay fp32.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
import flax
from flax import struct

from fvt_tpu import constants
from fvt_tpu.data.transforms import (train_video_transform,
                                     eval_video_transform)


def _device_transform(inputs: Dict[str, jnp.ndarray], train: bool,
                      rng: Optional[jax.Array] = None
                      ) -> Dict[str, jnp.ndarray]:
    """Raw uint8 video windows get the group transform on device
    (resize 48 -> crop 40 -> [flip] -> normalize); everything else passes
    through.  The dtype test is static at trace time."""
    out = None
    video = inputs.get(constants.VIDEO)
    if video is not None and video.dtype in (jnp.uint8, jnp.int8):
        out = dict(inputs)
        v = video.astype(jnp.float32)
        out[constants.VIDEO] = (train_video_transform(v, rng) if train
                                else eval_video_transform(v))
    # feature streams shipped as bf16 over H2D (--h2d_bf16_features)
    # upcast on device so model math stays fp32-parameterized
    for k, v in inputs.items():
        if k != constants.VIDEO and v.dtype == jnp.bfloat16:
            out = dict(inputs) if out is None else out
            out[k] = v.astype(jnp.float32)
    return out if out is not None else inputs


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


FROZEN_PREFIX = 'spatial'  # frozen backbone subtrees (requires_grad=False
# in the reference, model.py:432-433): excluded from grads AND the
# optimizer (so weight decay cannot drift them)


def split_frozen(params: Dict[str, Any]):
    trainable = {k: v for k, v in params.items()
                 if not k.startswith(FROZEN_PREFIX)}
    frozen = {k: v for k, v in params.items()
              if k.startswith(FROZEN_PREFIX)}
    return trainable, frozen


def create_train_state(model, optimizer, sample_batch: Dict[str, jnp.ndarray],
                       rng: jax.Array) -> TrainState:
    inputs = {k: v for k, v in sample_batch.items()
              if 'continuous_label' not in k}
    inputs = _device_transform(inputs, train=False)
    # jit the init: eager init of the 50-block ResNet dispatches thousands
    # of tiny ops (hundreds of seconds on TPU); compiled it is ~seconds
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False))(rng, inputs)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    trainable, _ = split_frozen(params)
    opt_state = optimizer.init(trainable)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def cross_entropy_frames(logits: jnp.ndarray, labels: jnp.ndarray
                         ) -> jnp.ndarray:
    """Mean CE over all B*T frames (trainer.py:370-383)."""
    b, t, c = logits.shape
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(b * t, c), labels.reshape(b * t)).mean()


def label_key(batch: Dict[str, Any]) -> str:
    """The single ``*continuous_label`` key of a batch — EXPR for the
    classification datasets, VA_continuous_label (or bare
    continuous_label) for the legacy regression data
    (base/trainer.py:265-269 pops whichever is present)."""
    keys = [k for k in batch if 'continuous_label' in k]
    assert len(keys) == 1, f'expected one label stream, got {keys}'
    return keys[0]


def train_step_body(model, optimizer,
                    task: str = constants.CLASSIFICATION,
                    with_outputs: bool = False) -> Callable:
    """The UNJITTED train step: forward (+ batch-stat update), loss,
    backward, optimizer update.  One body shared by the single-chip jit
    (make_train_step) and the DP pjit (parallel.dp.make_dp_train_step):
    the two wrappers differ only in sharding/donation kwargs, so their
    semantics cannot drift apart.

    ``with_outputs``: also return the train-mode forward outputs (the
    legacy regression loop records them for train metrics from the SAME
    forward that produced the loss, base/trainer.py:276-286)."""
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng_key: jax.Array):
        # per-step stream derived INSIDE the jit from (epoch key, step
        # counter): a host-side jax.random.fold_in per step is its own
        # tiny device dispatch, measured at 67 ms/step of tunnel
        # round-trip on axon (201 -> 134 ms/step when hoisted)
        dropout_rng = jax.random.fold_in(rng_key, state.step)
        labels = batch[label_key(batch)]
        inputs = {k: v for k, v in batch.items()
                  if 'continuous_label' not in k}
        transform_rng, dropout_rng = jax.random.split(dropout_rng)
        inputs = _device_transform(inputs, train=True, rng=transform_rng)
        trainable, frozen = split_frozen(state.params)

        def loss_fn(head):
            out, mutated = model.apply(
                {'params': {**head, **frozen},
                 'batch_stats': state.batch_stats},
                inputs, train=True,
                rngs={'dropout': dropout_rng},
                mutable=['batch_stats'])
            if task == constants.REGRESSION:
                from fvt_tpu.train.losses import ccc_loss
                # cast to the model output dtype (f32 in production; a
                # hard f32 cast would silently truncate the float64
                # lockstep legs — same lesson as _TorchBNCore)
                loss = ccc_loss(labels.astype(out.dtype), out[..., 0])
            else:
                loss = cross_entropy_frames(out, labels)
            return loss, (mutated['batch_stats'], out)

        (loss, (new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, trainable)
        new_head = optax.apply_updates(trainable, updates)
        new_params = {**new_head, **frozen}
        new_state = state.replace(params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        if with_outputs:
            return new_state, loss, out
        return new_state, loss

    return train_step


def make_train_step(model, optimizer,
                    task: str = constants.CLASSIFICATION,
                    with_outputs: bool = False) -> Callable:
    return jax.jit(train_step_body(model, optimizer, task, with_outputs))


def make_eval_step(model, needs_time_mask: bool = False,
                   extra_vars: Optional[Dict[str, Any]] = None) -> Callable:
    """Returns fn(params, batch_stats, inputs[, length]) -> (B, T, C) logits.

    Compiled once per input-shape bucket.  ``needs_time_mask`` for models
    whose attention spans time (JMT/MT).  ``extra_vars``: additional
    variable collections merged into every apply — e.g. the calibrated
    ``act_scales`` of ``--serve_quant int8_static`` (closed over, so XLA
    treats the scales as step constants).
    """
    extra = dict(extra_vars or {})

    if needs_time_mask:
        @jax.jit
        def eval_step(params, batch_stats, inputs, length):
            # length: scalar or per-row (B,) true frame counts
            inputs = _device_transform(inputs, train=False)
            b, t = next(iter(inputs.values())).shape[:2]
            length = jnp.broadcast_to(jnp.asarray(length), (b,))
            mask = jnp.arange(t)[None, :] < length[:, None]
            return model.apply({'params': params, 'batch_stats': batch_stats,
                                **extra},
                               inputs, train=False, time_mask=mask)
    else:
        @jax.jit
        def eval_step(params, batch_stats, inputs, length=None):
            inputs = _device_transform(inputs, train=False)
            return model.apply({'params': params, 'batch_stats': batch_stats,
                                **extra},
                               inputs, train=False)

    return eval_step
