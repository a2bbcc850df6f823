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


def make_dp_eval_step(model, mesh: Mesh, extra_vars=None,
                      needs_time_mask: bool = False) -> Callable:
    """``needs_time_mask`` mirrors steps.make_eval_step: JMT/MT apply a
    (B, T) valid-frame mask.  Their final attention runs over the
    flattened (B*T) axis (models/fusion.py:190-199) — under these jit
    shardings that is GLOBAL-array semantics, so the SPMD partitioner
    inserts the cross-device gathers the mixing needs and the result
    equals the single-device step (pinned by
    tests/test_data_parallel.py)."""
    import jax.numpy as jnp

    repl = replicated(mesh)
    bsh = batch_sharded(mesh)
    extra = dict(extra_vars or {})  # e.g. calibrated int8 'act_scales'

    if needs_time_mask:
        def step(params, batch_stats, inputs, length):
            inputs = _device_transform(inputs, train=False)
            b, t = next(iter(inputs.values())).shape[:2]
            length = jnp.broadcast_to(jnp.asarray(length), (b,))
            mask = jnp.arange(t)[None, :] < length[:, None]
            return model.apply({'params': params,
                                'batch_stats': batch_stats, **extra},
                               inputs, train=False, time_mask=mask)

        return jax.jit(step, in_shardings=(repl, repl, bsh, bsh),
                       out_shardings=bsh)

    def step(params, batch_stats, inputs):
        inputs = _device_transform(inputs, train=False)
        return model.apply({'params': params, 'batch_stats': batch_stats,
                            **extra},
                           inputs, train=False)

    return jax.jit(step, in_shardings=(repl, repl, bsh),
                   out_shardings=bsh)
