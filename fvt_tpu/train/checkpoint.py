"""Periodic checkpoint / resume (orbax).

The reference designed but disabled resume (base/checkpointer.py:10-137,
instantiation commented out at experiment.py:191-205).  Here it is live:
every ``checkpoint_every`` epochs the full training state — params,
batch stats, optimizer state, epoch counter, loss history, per-criterion
PerfTracker state and best-model copies — is saved; ``--resume true``
restores it and continues with identical tracker/master-metric state.
"""
from __future__ import annotations

import os
import pickle
from os.path import join
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from fvt_tpu.train.metrics import PerfTracker
from fvt_tpu.utils.logger import log


def _tracker_state(t: PerfTracker) -> dict:
    return {
        'first': t.first,
        'master_ignore_class': t.master_ignore_class,
        'master_metric': t.master_metric,
        'master_level': t.master_level,
        'master_video_pred': t.master_video_pred,
        'best_value': t.best_value,
        'best_value_idx': t.best_value_idx,
        'cnt': t.cnt,
        'is_last_best': t.is_last_best,
        'current_status_str': t.current_status_str,
        'best_status_str': t.best_status_str,
        'holder_list': t.holder_list,
    }


def _restore_tracker(state: dict) -> PerfTracker:
    t = PerfTracker(master_ignore_class=state['master_ignore_class'],
                    master_metric=state['master_metric'],
                    master_level=state['master_level'],
                    master_video_pred=state['master_video_pred'])
    for k, v in state.items():
        setattr(t, k, v)
    return t


class Checkpointer:
    def __init__(self, outd: str, every: int = 1, keep: int = 2):
        self.dir = join(outd, 'checkpoints')
        self.every = max(1, every)
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True))

    def should_save(self, epoch: int) -> bool:
        return (epoch + 1) % self.every == 0

    def save(self, epoch: int, state, trackers: Dict[Any, PerfTracker],
             best_params: dict, loss_tracker: list, scheduler=None,
             stopper_counter: Optional[int] = None):
        arrays = {
            'params': state.params,
            'batch_stats': state.batch_stats,
            'opt_state': state.opt_state,
            'step': state.step,
        }
        meta = {
            'epoch': epoch,
            'loss_tracker': list(loss_tracker),
            'trackers': {str(k): _tracker_state(t)
                         for k, t in trackers.items()},
            'tracker_keys': {str(k): k for k in trackers},
            'best_params': best_params,
            # stateful schedulers (MYWARMUP: current_lr/best/num_bad_epochs)
            # must resume exactly, not restart from base_lr
            'scheduler': scheduler.state_dict() if scheduler else {},
            # EarlyStopper countdown: without it a resumed run resets the
            # no-improvement budget and trains up to `budget` extra epochs
            # vs the uninterrupted run
            'stopper_counter': stopper_counter,
        }
        self.mngr.save(epoch, args=ocp.args.StandardSave(arrays))
        self.mngr.wait_until_finished()
        # tracker/meta state sidecar (orbax here has no pickle handler).
        # Written atomically: a partial pickle from a mid-write crash
        # would poison restore; a MISSING sidecar (crash between the
        # orbax save and this write) is handled by restore()'s fallback.
        tmp = join(self.dir, f'meta_{epoch}.pkl.tmp')
        with open(tmp, 'wb') as f:
            pickle.dump(meta, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, join(self.dir, f'meta_{epoch}.pkl'))
        live = {f'meta_{s}.pkl' for s in self.mngr.all_steps()}
        for old in os.listdir(self.dir):
            if old.startswith('meta_') and old not in live:
                os.remove(join(self.dir, old))
        log(f"checkpoint saved at epoch {epoch} -> {self.dir}")

    def latest_epoch(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state_template, scheduler=None) -> Optional[Tuple]:
        """Returns (epoch, state, trackers, best_params, loss_tracker).

        ``scheduler`` (if given) is restored in place from the saved
        state_dict, so MYWARMUP continues with its plateau-decayed lr.

        A step whose meta sidecar is missing (the process died between
        the orbax array save and the sidecar write) is skipped in favor
        of the newest step that has BOTH halves — otherwise one crash in
        that window would brick --resume with a FileNotFoundError."""
        step, meta = None, None
        for s in sorted(self.mngr.all_steps(), reverse=True):
            mp = join(self.dir, f'meta_{s}.pkl')
            if os.path.isfile(mp):
                with open(mp, 'rb') as f:
                    meta = pickle.load(f)
                step = s
                break
            log(f"WARNING: checkpoint step {s} has arrays but no meta "
                f"sidecar (crash mid-save?); trying an older step")
        if step is None:
            return None
        arrays_tpl = {
            'params': state_template.params,
            'batch_stats': state_template.batch_stats,
            'opt_state': state_template.opt_state,
            'step': state_template.step,
        }
        arrays = self.mngr.restore(
            step, args=ocp.args.StandardRestore(arrays_tpl))

        state = state_template.replace(
            params=arrays['params'], batch_stats=arrays['batch_stats'],
            opt_state=arrays['opt_state'], step=arrays['step'])
        trackers = {meta['tracker_keys'][ks]: _restore_tracker(ts)
                    for ks, ts in meta['trackers'].items()}
        if scheduler is not None and meta.get('scheduler'):
            scheduler.load_state_dict(meta['scheduler'])
        # exposed as an attribute so the 5-tuple contract stays stable
        # (None for checkpoints written before this field existed)
        self.restored_stopper_counter = meta.get('stopper_counter')
        log(f"restored checkpoint from epoch {meta['epoch']}")
        return (meta['epoch'], state, trackers, meta['best_params'],
                meta['loss_tracker'])
