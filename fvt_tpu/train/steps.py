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


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, optimizer, sample_batch: Dict[str, jnp.ndarray],
                       rng: jax.Array) -> TrainState:
    inputs = {k: v for k, v in sample_batch.items()
              if 'continuous_label' not in k}
    variables = model.init(rng, inputs, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    opt_state = optimizer.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def cross_entropy_frames(logits: jnp.ndarray, labels: jnp.ndarray
                         ) -> jnp.ndarray:
    """Mean CE over all B*T frames (trainer.py:370-383)."""
    b, t, c = logits.shape
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(b * t, c), labels.reshape(b * t)).mean()


def make_train_step(model, optimizer) -> Callable:
    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   dropout_rng: jax.Array):
        labels = batch[constants.EXPR]
        inputs = {k: v for k, v in batch.items()
                  if 'continuous_label' not in k}

        def loss_fn(params):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                inputs, train=True,
                rngs={'dropout': dropout_rng},
                mutable=['batch_stats'])
            loss = cross_entropy_frames(out, labels)
            return loss, mutated['batch_stats']

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        return new_state, loss

    return train_step


def make_eval_step(model, needs_time_mask: bool = False) -> Callable:
    """Returns fn(params, batch_stats, inputs[, length]) -> (B, T, C) logits.

    Compiled once per input-shape bucket.  ``needs_time_mask`` for models
    whose attention spans time (JMT/MT).
    """
    if needs_time_mask:
        @jax.jit
        def eval_step(params, batch_stats, inputs, length):
            t = next(iter(inputs.values())).shape[1]
            mask = jnp.arange(t)[None, :] < length
            return model.apply({'params': params, 'batch_stats': batch_stats},
                               inputs, train=False, time_mask=mask)
    else:
        @jax.jit
        def eval_step(params, batch_stats, inputs, length=None):
            return model.apply({'params': params, 'batch_stats': batch_stats},
                               inputs, train=False)

    return eval_step
