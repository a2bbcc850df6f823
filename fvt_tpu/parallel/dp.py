"""Data-parallel train/eval steps via jit + shardings (pjit style).

The step body is IDENTICAL to the single-chip one (fvt_tpu.train.steps);
sharding annotations on inputs/outputs let the XLA SPMD partitioner split
the batch over the ``data`` axis and insert the gradient/batch-stat
all-reduces over ICI.  BatchNorm note: per-shard batch stats are averaged
via a cross-replica mean inside the step so running stats match the
global-batch semantics.
"""
from __future__ import annotations

from typing import Callable

import jax

from fvt_tpu import constants
from fvt_tpu.parallel.mesh import Mesh, batch_sharded, replicated
from fvt_tpu.train.steps import _device_transform, train_step_body


def make_dp_train_step(model, optimizer, mesh: Mesh,
                       task: str = constants.CLASSIFICATION) -> Callable:
    """SAME step body as the single-chip jit (steps.train_step_body —
    including the in-jit (epoch key, step counter) rng fold, which keeps
    DP == single-device stream-for-stream); only the sharding
    annotations differ: batch over the data axis, state replicated, and
    the XLA SPMD partitioner inserts the gradient/batch-stat
    all-reduces over ICI."""
    repl = replicated(mesh)
    bsh = batch_sharded(mesh)
    return jax.jit(
        train_step_body(model, optimizer, task),
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
