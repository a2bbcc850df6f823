"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY §2.4); here data-parallelism is
first-class: a 1-D ``data`` mesh axis, batches sharded along it, params/
opt-state replicated, and XLA's SPMD partitioner inserting the gradient
all-reduce over ICI.  The mesh abstraction keeps extra axes expressible
(e.g. ('data', 'model')) even though these models don't need TP.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS
              ) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, \
            f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_nd(shape: tuple, axes: tuple = (DATA_AXIS, MODEL_AXIS)
                 ) -> Mesh:
    """n-D mesh, e.g. ``make_mesh_nd((4, 2))`` -> axes ('data','model').

    These models need no TP (<10 M trainable params, SURVEY §2.4), but
    the sharding design must stay EXPRESSIBLE on a richer mesh: any
    param can carry a PartitionSpec over 'model' and GSPMD inserts the
    collectives.  tests/test_model_axis.py proves a 'model'-sharded
    head reproduces single-device logits on a ('data','model') mesh.
    """
    n = int(np.prod(shape))
    devices = jax.devices()
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    assert len(shape) == len(axes), (shape, axes)
    return Mesh(np.asarray(devices[:n]).reshape(shape), tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """Place a host batch with the leading dim split across the mesh."""
    sharding = batch_sharded(mesh, axis)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
