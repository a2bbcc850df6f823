"""Data-parallel train/eval steps via jit + shardings (pjit style).

The step body is IDENTICAL to the single-chip one (fvt_tpu.train.steps);
sharding annotations on inputs/outputs let the XLA SPMD partitioner split
the batch over the ``data`` axis and insert the gradient/batch-stat
all-reduces over ICI.  BatchNorm note: per-shard batch stats are averaged
via a cross-replica mean inside the step so running stats match the
global-batch semantics.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from fvt_tpu import constants
from fvt_tpu.parallel.mesh import (Mesh, batch_sharded, replicated,
                                   DATA_AXIS)
from fvt_tpu.train.steps import (TrainState, cross_entropy_frames,
                                 _device_transform, split_frozen)


def make_dp_train_step(model, optimizer, mesh: Mesh,
                       task: str = constants.CLASSIFICATION) -> Callable:
    repl = replicated(mesh)
    bsh = batch_sharded(mesh)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             rng_key: jax.Array):
        # same in-jit (epoch key, step counter) fold as the single-chip
        # step — keeps DP == single-device stream-for-stream and avoids
        # the measured 67 ms/step host fold_in dispatch
        dropout_rng = jax.random.fold_in(rng_key, state.step)
        labels = batch[constants.EXPR]
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
                loss = ccc_loss(labels.astype(jnp.float32), out[..., 0])
            else:
                loss = cross_entropy_frames(out, labels)
            return loss, mutated['batch_stats']

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, trainable)
        new_head = optax.apply_updates(trainable, updates)
        new_params = {**new_head, **frozen}
        new_state = state.replace(params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        return new_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, bsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,))


def make_dp_eval_step(model, mesh: Mesh, extra_vars=None) -> Callable:
    repl = replicated(mesh)
    bsh = batch_sharded(mesh)
    extra = dict(extra_vars or {})  # e.g. calibrated int8 'act_scales'

    def step(params, batch_stats, inputs):
        inputs = _device_transform(inputs, train=False)
        return model.apply({'params': params, 'batch_stats': batch_stats,
                            **extra},
                           inputs, train=False)

    return jax.jit(step, in_shardings=(repl, repl, bsh),
                   out_shardings=bsh)
