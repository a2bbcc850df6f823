"""Per-host sharded data loading for multi-process (multi-host) jobs.

The reference is single-GPU/single-process (SURVEY §2.4); on a TPU pod
slice JAX runs one process per host, each seeing only its addressable
devices.  The contract here:

  * every process derives the SAME deterministic global batch order from
    the seed (fvt_tpu.utils.rng epoch permutations are pure functions of
    (seed, epoch));
  * each process BUILDS only its contiguous row-slice of every global
    batch (`TrainLoader.epoch_local` — per-host IO, the point of
    multi-host loading);
  * the global device array is assembled with
    ``jax.make_array_from_process_local_data`` over the ``data`` axis,
    so the jitted DP step (parallel/dp.py) is unchanged;
  * a global batch not divisible by the process count is built in FULL
    by every process and runs through the trainer's replicated ragged
    path — identical loss semantics to single-host (the reference
    consumes every batch, trainer.py:345-391).

With ``process_count == 1`` everything degenerates to the single-host
behavior exactly (tested on the virtual 8-device CPU mesh).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax

from fvt_tpu.parallel.mesh import Mesh, batch_sharded, DATA_AXIS


def process_info() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def host_slice(global_rows: int, process_index: Optional[int] = None,
               process_count: Optional[int] = None
               ) -> Optional[Tuple[int, int]]:
    """[start, stop) of the rows this process owns, or None when the
    batch is not evenly divisible (callers replicate it instead)."""
    if process_index is None or process_count is None:
        process_index, process_count = process_info()
    if process_count <= 1:
        return 0, global_rows
    if global_rows % process_count:
        return None
    per = global_rows // process_count
    return process_index * per, (process_index + 1) * per


def global_batch(mesh: Mesh, local: Dict, axis: str = DATA_AXIS) -> Dict:
    """Assemble the global (process-spanning) sharded batch from this
    process's local row-slice."""
    sharding = batch_sharded(mesh, axis)
    return {k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in local.items()}
