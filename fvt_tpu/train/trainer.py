"""Training / evaluation runtime.

The live loop of /root/reference/trainer.py:315-786, TPU-re-designed:

  * jitted fused train step (forward+CE+backward+update) per batch shape;
  * eval on whole videos at bucketed lengths (exact for frame-causal
    models; masked attention for JMT/MT);
  * LFAN long-video inference: batched window forward + one vectorized
    stitch (replaces the per-window python loop trainer.py:832-892);
  * per-criterion best-model tracking with host-side param copies, final
    test pass per best model, and the reference artifact contract:
    test-<item>-perf.{txt,pkl}, pred-per-frame-test-<item>-perf.pkl,
    best-models/<item>/{model.msgpack,config.yml}, passed.txt, and the
    challenge prediction.pkl dump.
"""
from __future__ import annotations

import datetime as dt
import os
import pickle as pkl
import time
from os.path import join
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import yaml
from flax import serialization

from fvt_tpu import constants
from fvt_tpu.data.loader import TrainLoader, EvalLoader, round_up
from fvt_tpu.data import windowing as W
from fvt_tpu.train import metrics as M
from fvt_tpu.train import optim
from fvt_tpu.train.steps import (TrainState, create_train_state,
                                 make_train_step, make_eval_step)
from fvt_tpu.utils import rng as rng_mod
from fvt_tpu.utils.logger import log, fmsg


def _assert_hosts_agree(batch: Dict[str, np.ndarray]):
    """Debug guard (--multihost_digest_check) for the replicated ragged
    path: every host must have built a BIT-IDENTICAL full batch — any
    host-dependent nondeterminism in the builder (e.g. a locally stale
    recompacted store) would otherwise silently desync replicas.  Costs
    one 8-byte all-gather per ragged batch."""
    import hashlib
    from jax.experimental import multihost_utils

    h = hashlib.sha256()
    for k in sorted(batch):
        h.update(k.encode())
        h.update(np.ascontiguousarray(batch[k]).tobytes())
    local = np.frombuffer(h.digest()[:8], dtype=np.int64)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    if not (gathered == gathered.reshape(-1)[0]).all():
        raise RuntimeError(
            f"multihost desync: replicated-batch digests differ across "
            f"hosts: {gathered.reshape(-1).tolist()} — a host built "
            f"different batch bytes (stale store? nondeterministic "
            f"builder?)")


class EarlyStopper:
    """Early stopping with the reference's legacy semantics
    (/root/reference/trainer.py:264-273): once past ``min_epochs``, a
    countdown from ``budget`` that resets to ``budget`` on any
    validation improvement and decrements otherwise; reaching 0 stops.
    ``budget`` <= 0 disables.  (The reference's live loop ignores the
    early_stopping config knob entirely; here it is honored.)"""

    def __init__(self, budget: int, min_epochs: int):
        self.budget = int(budget or 0)
        self.min_epochs = min_epochs
        self.counter = self.budget

    def should_stop(self, epoch: int, improved: bool) -> bool:
        if self.budget <= 0 or (epoch + 1) <= self.min_epochs:
            return False
        self.counter = self.budget if improved else self.counter - 1
        return self.counter <= 0


class Trainer:
    def __init__(self, model, model_name: str, args, cl_to_int: dict,
                 int_to_cl: dict, train_step_fn=None):
        self.model = model
        self.model_name = model_name
        self.args = args
        self.cl_to_int = cl_to_int
        self.int_to_cl = int_to_cl

        hp = optim.standardize_opt_params(vars(args))
        self.hp = hp
        self.optimizer = optim.build_optimizer(hp)
        self.scheduler = optim.build_scheduler(
            hp, args.num_epochs, args.min_num_epochs)
        if (not getattr(hp, 'honor_lr', False)
                and not isinstance(self.scheduler, optim.MyWarmupSchedule)
                and abs(hp.lr - optim.TORCH_DEFAULT_LR) > 1e-12):
            # keyed on the BUILT scheduler, not the configured name:
            # --opt__lr_scheduler false with name=MYWARMUP builds no
            # scheduler, and opt__lr is then ignored like anywhere else
            # surface the reproduced reference quirk loudly: a user who
            # set --opt__lr deserves to know it is ignored by default
            # (DESIGN.md §15; the reference logs the configured value
            # while training at torch's default)
            log(fmsg(
                f"NOTE: opt__lr={hp.lr} is IGNORED — reproducing the "
                f"reference's optimizer wiring (instantiators.py:74-92 "
                f"never passes lr; effective lr = "
                f"{optim.TORCH_DEFAULT_LR}). Pass --opt__honor_lr true "
                f"to actually train at opt__lr."))

        self.mesh = None
        if getattr(args, 'data_parallel', False) and len(jax.devices()) > 1:
            from fvt_tpu.parallel.mesh import make_mesh
            from fvt_tpu.parallel.dp import make_dp_train_step
            self.mesh = make_mesh()
            self.train_step = train_step_fn or make_dp_train_step(
                self.model, self.optimizer, self.mesh, task=args.task)
            log(fmsg(f"data-parallel over {self.mesh.shape} devices"))
        else:
            self.train_step = train_step_fn or make_train_step(
                self.model, self.optimizer, task=args.task)
        needs_mask = model_name in (constants.JMT, constants.MT)
        if needs_mask:
            self.eval_step = make_eval_step(self.model,
                                            needs_time_mask=True)
        elif model_name == constants.LFAN and \
                getattr(args, 'pallas_serving', False):
            # fused-TCN Pallas forward (1.6x on feature workloads);
            # bf16-noise-level divergence from the XLA path
            from fvt_tpu.serve import build_lfan_serving_step
            self.eval_step = build_lfan_serving_step(self.model)
        else:
            self.eval_step = make_eval_step(self.model)
        self.needs_mask = needs_mask

        self.state: Optional[TrainState] = None
        self.fit_finished = False

    # ----------------------------------------------------------------- init
    def init_state(self, sample_batch: Dict[str, np.ndarray]):
        key = rng_mod.root_key(self.args.seed)
        batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
        self.state = create_train_state(
            self.model, self.optimizer, batch,
            rng_mod.fold_key(key, 'init'))
        return self.state

    def calibrate_quant(self, sample_batch: Dict[str, np.ndarray]):
        """--serve_quant int8_static: record per-conv max|x| over one
        representative batch (the backbone is frozen, so post-BN/PReLU
        activation ranges are stationary across the run), then rebuild
        the eval step with the calibrated scales closed over — XLA sees
        them as constants and the per-batch max-reduction pass of the
        dynamic int8 path disappears from the serving program.  Values
        outside the calibrated range clip to ±127 (standard symmetric
        int8); the measured quality delta lives in tools/quant_delta.py.
        """
        from fvt_tpu.ops.quant import calibrate_act_scales
        assert self.state is not None, 'init_state first'
        scales = calibrate_act_scales(self.model, self.state.params,
                                      self.state.batch_stats,
                                      sample_batch)
        n = len(jax.tree.leaves(scales))
        log(fmsg(f'int8_static: calibrated {n} activation scales'))
        self.act_scales = scales
        self.eval_step = make_eval_step(self.model,
                                        needs_time_mask=self.needs_mask,
                                        extra_vars={'act_scales': scales})
        # the lazily-built window/DP eval steps close over eval_step /
        # the model apply — force rebuilds on top of the new scales
        self._win_step = None
        self._dp_eval = None
        return scales

    # ---------------------------------------------------------------- train
    def train_one_epoch(self, loader: TrainLoader, epoch: int) -> float:
        t0 = dt.datetime.now()
        epoch_key = rng_mod.fold_key(
            rng_mod.root_key(self.args.seed), 'epoch', epoch)

        profiling = epoch < getattr(self.args, 'profile_epochs', 0)
        if profiling:
            trace_dir = os.path.join(self.args.outd, 'profile')
            jax.profiler.start_trace(trace_dir)
            log(f"jax.profiler tracing epoch {epoch} -> {trace_dir}")

        # the trace must close on EVERY exit (nan_guard raise,
        # OOM mid-loop): a leaked start_trace corrupts exactly the
        # epoch one most wants to inspect
        try:
            n_dev = len(self.mesh.devices.flat) if self.mesh is not None else 1

            # losses accumulate ON DEVICE and sync once per epoch (the
            # reference keeps running_loss as a GPU tensor too); a per-step
            # float(loss) would serialize H2D transfers against compute
            multihost = self.mesh is not None and jax.process_count() > 1
            if multihost:
                # each host builds only its row-slice of every global batch
                # (parallel/multihost.py); the plan is seed-deterministic so
                # all hosts agree on batch boundaries
                source = loader.epoch_local(epoch, divisor=n_dev)
            else:
                source = ((b, None) for b in loader.epoch(epoch))

            # ragged-batch accounting: batches not divisible by the device
            # (and process) count are built IN FULL on every host and run
            # replicated — correct but the replicated IO/compute is wasted
            # work on a pod, so surface how often a bucket plan causes it
            ragged_stat = {'ragged': 0, 'sharded': 0}

            def to_device(batch, global_rows):
                """(jbatch, step_fn) for one host batch — async device_put,
                so the transfer queues while the previous step computes."""
                local_rows = next(iter(batch.values())).shape[0]
                bsz = local_rows if global_rows is None else global_rows
                step_fn = self.train_step
                if self.mesh is not None:
                    from fvt_tpu.parallel.mesh import shard_batch, replicated
                    if multihost and local_rows != bsz:
                        from fvt_tpu.parallel import multihost as mh
                        ragged_stat['sharded'] += 1
                        jbatch = mh.global_batch(self.mesh, batch)
                    elif bsz % n_dev != 0 or multihost:
                        ragged_stat['ragged'] += 1
                        # ragged batch (the loader yields it in FULL on every
                        # host): run it REPLICATED through the single-device
                        # step — every chip computes the same small batch, so
                        # the loss and batch-norm statistics match the
                        # reference exactly (it consumes every batch,
                        # trainer.py:345-391); padding + masking would
                        # perturb BN batch stats
                        repl = replicated(self.mesh)
                        if multihost:
                            if getattr(self.args, 'multihost_digest_check',
                                       False):
                                _assert_hosts_agree(batch)
                            jbatch = {
                                k: jax.make_array_from_process_local_data(
                                    repl, v)
                                for k, v in batch.items()}
                        else:
                            jbatch = {k: jax.device_put(v, repl)
                                      for k, v in batch.items()}
                        step_fn = self._ragged_train_step()
                    else:
                        ragged_stat['sharded'] += 1
                        jbatch = shard_batch(batch, self.mesh)
                else:
                    jbatch = {k: jax.device_put(v) for k, v in batch.items()}
                return jbatch, step_fn

            # one-batch H2D lookahead: batch i+1's transfer is queued before
            # step i is dispatched, so the (tunnel-expensive) host->device
            # copies overlap device compute instead of serializing with it
            losses = []
            prepared = None
            for batch, global_rows in source:
                nxt = to_device(batch, global_rows)
                if prepared is not None:
                    jbatch, step_fn = prepared
                    # per-step stream folded INSIDE the jitted step from
                    # (epoch_key, state.step) — a host-side fold_in here is
                    # an extra 67 ms dispatch over the axon tunnel
                    self.state, loss = step_fn(self.state, jbatch, epoch_key)
                    losses.append(loss)
                prepared = nxt
            if prepared is not None:
                jbatch, step_fn = prepared
                self.state, loss = step_fn(self.state, jbatch, epoch_key)
                losses.append(loss)

            losses = [float(l) for l in losses]
            count = len(losses)
            running = sum(losses)
            if getattr(self.args, 'nan_guard', False) and \
                    not np.isfinite(running):
                bad = next(i for i, l in enumerate(losses)
                           if not np.isfinite(l))
                raise FloatingPointError(
                    f"non-finite loss {losses[bad]} at epoch {epoch} "
                    f"step {bad} (lr={optim.get_lr(self.state.opt_state):.3e})")

        finally:
            if profiling:
                jax.profiler.stop_trace()

        # next-epoch lr (scheduler stepped after each epoch, trainer.py:694)
        if self.scheduler is not None:
            lr = self.scheduler.lr(epoch + 1)
            self.state = self.state.replace(
                opt_state=optim.set_lr(self.state.opt_state, lr))

        nr, ns = ragged_stat['ragged'], ragged_stat['sharded']
        if multihost and nr:
            # on a real pod every ragged batch replicates the full
            # build+IO on every host — a bucket plan that makes this
            # common (e.g. many small --train_bucketed buckets) should
            # be retuned (raise eval/train bucket quantum or batch size)
            log(fmsg(f"multihost: {nr}/{nr + ns} batches ran replicated "
                     f"(size not divisible by {n_dev} devices); each "
                     f"replicates its IO+build on every host"))

        epoch_loss = running / max(count, 1)
        log(fmsg(f"Train epoch ({epoch}/{self.args.num_epochs}) "
                 f"loss: {epoch_loss:.6f} "
                 f"runtime: {dt.datetime.now() - t0}"))
        return epoch_loss

    def _ragged_train_step(self):
        """Lazily-built plain (unsharded) train step for the one
        non-device-divisible batch per epoch under DP; state stays
        replicated on the mesh, outputs too."""
        if getattr(self, '_ragged_step', None) is None:
            self._ragged_step = make_train_step(
                self.model, self.optimizer, task=self.args.task)
        return self._ragged_step

    # ------------------------------------------------------------ inference
    def _dp_eval_step(self):
        """Lazily-built mesh-sharded eval step (window batches of one long
        video spread over the data axis — the honest context-parallel
        analogue for this workload, SURVEY §2.4)."""
        if getattr(self, '_dp_eval', None) is None:
            from fvt_tpu.parallel.dp import make_dp_eval_step
            extra = None
            if getattr(self, 'act_scales', None) is not None:
                extra = {'act_scales': self.act_scales}
            self._dp_eval = make_dp_eval_step(self.model, self.mesh,
                                              extra_vars=extra)
        return self._dp_eval

    def _win_eval_step(self):
        """Lazily-built device-side windowed eval: the long video's
        arrays live ON DEVICE once (each frame crosses the tunnel/PCIe
        exactly once) and the (n_win, window) gather happens inside the
        jit — vs the pooled host-side window batches that re-transfer
        every overlap (window/hop = 1.5x H2D bytes).  Measured on axon
        (38 MB/s H2D tunnel) this is the difference between
        transfer-bound and loader-bound e2e; see bench.py's breakdown.
        One compile per (ladder_len, n_win_pad) pair — quantized by
        windowing.ladder_len to O(log L) shapes."""
        if getattr(self, '_win_step', None) is None or \
                getattr(self, '_win_step_mesh', 'unset') is not self.mesh:
            self._win_step_mesh = self.mesh
            base = self.eval_step

            def step(params, stats, arrays, idx):
                inputs = {k: jnp.take(v, idx, axis=0)
                          for k, v in arrays.items()}
                return base(params, stats, inputs)

            if self.mesh is not None:
                from fvt_tpu.parallel.mesh import (replicated,
                                                   batch_sharded)
                repl = replicated(self.mesh)
                bsh = batch_sharded(self.mesh)
                self._win_step = jax.jit(
                    step, in_shardings=(repl, repl, repl, bsh),
                    out_shardings=bsh)
            else:
                self._win_step = jax.jit(step)
        return self._win_step

    def _forward_windows(self, batch: Dict[str, np.ndarray], true_len: int
                         ) -> np.ndarray:
        """TEST ORACLE ONLY — not called by `inference()`.

        LFAN window-and-stitch for ONE video longer than the model
        window (trainer.py:832-892), as a batched forward + vectorized
        stitch; with a device mesh, the window batch is sharded across
        chips.  The live path is the pooled wqueue inside `inference()`
        (bit-identical by tests/test_batched_eval.py); this method is
        kept as the simple per-video reference those tests compare
        against, and shares the same `W.stitch_windows_np`."""
        window = self.args.window_length
        hop = self.args.hop_length
        mat = W.window_index_matrix(true_len, window, hop)
        n_win = mat.shape[0]
        n_dev = len(self.mesh.devices.flat) if self.mesh is not None else 1
        n_pad = round_up(n_win, max(4, n_dev))

        windows = {}
        for k, v in batch.items():
            arr = v[0]  # (bucket, ...)
            g = arr[mat.reshape(-1)].reshape(
                (n_win, window) + arr.shape[1:])
            if n_pad > n_win:
                g = np.concatenate(
                    [g, np.repeat(g[-1:], n_pad - n_win, axis=0)], axis=0)
            windows[k] = jnp.asarray(g)

        if self.mesh is not None and not self.needs_mask:
            from fvt_tpu.parallel.mesh import shard_batch
            with self.mesh:
                out = self._dp_eval_step()(
                    self.state.params, self.state.batch_stats,
                    shard_batch(windows, self.mesh))
        elif self.needs_mask:
            out = self.eval_step(self.state.params, self.state.batch_stats,
                                 windows, jnp.asarray(window))
        else:
            out = self.eval_step(self.state.params, self.state.batch_stats,
                                 windows)
        out = np.asarray(out)[:n_win]  # (n_win, window, C)
        return W.stitch_windows_np(out, mat, true_len)

    def inference(self, loader: EvalLoader) -> tuple:
        # per-phase wall-time attribution of THIS pass, exposed for the
        # benchmark (VERDICT r2 #1: the e2e number must be explainable):
        #   loader_s    blocked waiting on the threaded disk loader
        #   wingather_s host gather of window rows from bucket arrays
        #   dispatch_s  np.stack + device_put + step dispatch (async)
        #   sync_s      np.asarray(out) — device compute + D2H + tunnel
        #   stitch_s    host scatter-average stitch
        tm = {'loader_s': 0.0, 'wingather_s': 0.0, 'dispatch_s': 0.0,
              'sync_s': 0.0, 'stitch_s': 0.0, 'h2d_bytes': 0}
        self.last_inference_timing = tm
        _pc = time.perf_counter
        per_video_frame_logits = {}
        win_threshold = (self.args.window_length
                         if self.model_name == constants.LFAN else None)
        batch_videos = getattr(self.args, 'eval_video_batch', 8)
        if self.model_name in (constants.JMT, constants.MT):
            # JMT/MT's final self-attention runs over the flattened (B*T)
            # axis (model.py:967-975) — batching videos would mix them;
            # keep the reference's bs=1 eval semantics
            batch_videos = 1

        window = self.args.window_length
        hop = self.args.hop_length
        n_dev = len(self.mesh.devices.flat) if self.mesh is not None else 1
        wb = int(getattr(self.args, 'eval_window_batch', 8) or 8)
        wb = round_up(max(wb, n_dev), n_dev)

        # device->host transfers run two batches behind the dispatches so
        # eval compute overlaps the loader and the transfers (jax arrays
        # are futures; np.asarray is the sync point)
        from collections import deque
        pending = deque()

        # ---- pooled window-stitch machinery (LFAN long videos): the
        # windows of ALL long videos ride fixed (wb, window, ...) batches —
        # one compile shape, no per-video pad waste, no per-video sync.
        # Per-window forwards are sample-independent (eval-mode BN uses
        # running stats), so outputs are bit-identical to the per-video
        # path (tests/test_batched_eval.py).
        wstate: Dict[str, dict] = {}
        wqueue: list = []  # (trial, window_row)

        n_dev_w = n_dev if self.mesh is not None else 1

        # --h2d_bf16_features (opt-in): ship fp32 feature streams as
        # bf16 over the (tunnel/PCIe) H2D link — ~15% fewer bytes on
        # tri-modal loads.  CHANGES NUMERICS (~2^-8 relative on
        # features); off by default so eval parity stays exact.
        cast_feats = getattr(self.args, 'h2d_bf16_features', False)

        def maybe_cast(arr):
            if cast_feats and arr.dtype == np.float32:
                import ml_dtypes
                return arr.astype(ml_dtypes.bfloat16)
            return arr

        # --h2d_precrop_video: eval's center crop is deterministic, so
        # take it on the HOST (a [4:44] slice of the loader's 48^2
        # output) and ship 40^2 uint8 — 31% fewer video H2D bytes,
        # bit-identical logits (the device transform's resize no-ops at
        # 48; at 40 it skips straight to normalize).  Guarded on the
        # exact loader shape so any other store geometry falls through
        # to the device path untouched.
        precrop = getattr(self.args, 'h2d_precrop_video', True)
        from fvt_tpu.data.transforms import (CROP_SIZE, SCALE_SIZE,
                                             center_crop_offset)

        def maybe_precrop(batch):
            v = batch.get(constants.VIDEO)
            if (precrop and v is not None and v.dtype == np.uint8
                    and v.shape[-3] == SCALE_SIZE
                    and v.shape[-2] == SCALE_SIZE):
                off = center_crop_offset(SCALE_SIZE, CROP_SIZE)
                batch[constants.VIDEO] = np.ascontiguousarray(
                    v[..., off:off + CROP_SIZE, off:off + CROP_SIZE, :])
            return batch

        def dispatch_video_windows(batch, labels, trial, true_len):
            """Device-side windowing: upload the video ONCE (ladder-
            padded), gather + forward all its windows in one jit."""
            t0 = _pc()
            mat = W.window_index_matrix(true_len, window, hop)
            n_win = mat.shape[0]
            l_pad = W.ladder_len(true_len, window)
            nw_pad = len(W.window_starts(l_pad, window, hop))
            nw_pad = round_up(max(nw_pad, n_win), max(1, n_dev_w))
            mat_p = np.concatenate(
                [mat, np.repeat(mat[-1:], nw_pad - n_win, axis=0)]
            ).astype(np.int32)
            tm['wingather_s'] += _pc() - t0

            t0 = _pc()
            arrays = {}
            for k, v in batch.items():
                arr = v[0]  # (bucket, ...)
                if l_pad > arr.shape[0]:
                    arr = np.concatenate(
                        [arr, np.zeros((l_pad - arr.shape[0],)
                                       + arr.shape[1:], arr.dtype)])
                arr = maybe_cast(arr)
                arrays[k] = jax.device_put(arr)
                tm['h2d_bytes'] += arr.nbytes
            idx = jax.device_put(mat_p)
            if self.mesh is not None:
                with self.mesh:
                    out = self._win_eval_step()(
                        self.state.params, self.state.batch_stats,
                        arrays, idx)
            else:
                out = self._win_eval_step()(
                    self.state.params, self.state.batch_stats,
                    arrays, idx)
            pending.append(('vwin', out, trial, mat, n_win, true_len,
                            np.asarray(labels[0, :true_len]).flatten()))
            tm['dispatch_s'] += _pc() - t0

        def enqueue_windowed(batch, labels, trial, true_len):
            t0 = _pc()
            mat = W.window_index_matrix(true_len, window, hop)
            n_win = mat.shape[0]
            arrs = {}
            for k, v in batch.items():
                arr = v[0]  # (bucket, ...)
                arrs[k] = arr[mat.reshape(-1)].reshape(
                    (n_win, window) + arr.shape[1:])
            tm['wingather_s'] += _pc() - t0
            wstate[trial] = dict(
                mat=mat, n_win=n_win, true_len=true_len,
                labels=np.asarray(labels[0, :true_len]).flatten(),
                arrs=arrs, outs=None, done=np.zeros(n_win, bool))
            wqueue.extend((trial, r) for r in range(n_win))

        def dispatch_window_batches(flush=False):
            while len(wqueue) >= wb or (flush and wqueue):
                t0 = _pc()
                take = wqueue[:wb]
                del wqueue[:wb]
                rows = take + [take[-1]] * (wb - len(take))  # tail pad
                inputs = {
                    k: jax.device_put(maybe_cast(np.stack(
                        [wstate[t]['arrs'][k][r] for (t, r) in rows])))
                    for k in wstate[rows[0][0]]['arrs']}
                tm['h2d_bytes'] += sum(
                    v.nbytes for v in inputs.values())
                if self.mesh is not None:
                    from fvt_tpu.parallel.mesh import shard_batch
                    with self.mesh:
                        out = self._dp_eval_step()(
                            self.state.params, self.state.batch_stats,
                            shard_batch(inputs, self.mesh))
                else:
                    out = self.eval_step(self.state.params,
                                         self.state.batch_stats, inputs)
                pending.append(('win', out, tuple(rows)))
                tm['dispatch_s'] += _pc() - t0

        def finish_windowed(trial):
            t0 = _pc()
            st = wstate.pop(trial)
            per_video_frame_logits[trial] = {
                'labels': st['labels'],
                'logits': W.stitch_windows_np(st['outs'], st['mat'],
                                              st['true_len'])}
            tm['stitch_s'] += _pc() - t0

        def collect(entry):
            if entry[0] == 'vwin':
                _, out, trial, mat, n_win, true_len, labels_v = entry
                t0 = _pc()
                out = np.asarray(out)[:n_win]
                tm['sync_s'] += _pc() - t0
                t0 = _pc()
                per_video_frame_logits[trial] = {
                    'labels': labels_v,
                    'logits': W.stitch_windows_np(out, mat, true_len)}
                tm['stitch_s'] += _pc() - t0
                return
            if entry[0] == 'win':
                _, out, rows = entry
                t0 = _pc()
                out = np.asarray(out)
                tm['sync_s'] += _pc() - t0
                for i, (trial, r) in enumerate(rows):
                    st = wstate.get(trial)
                    if st is None or st['done'][r]:
                        continue  # tail-padding duplicate
                    if st['outs'] is None:
                        st['outs'] = np.empty(
                            (st['n_win'], window, out.shape[-1]),
                            np.float32)
                    st['outs'][r] = out[i]
                    st['done'][r] = True
                for trial in [t for t in wstate
                              if wstate[t]['done'].all()]:
                    finish_windowed(trial)
                return
            _, out, labels, trials, true_lens = entry
            t0 = _pc()
            out = np.asarray(out)
            tm['sync_s'] += _pc() - t0
            for j, trial in enumerate(trials):
                assert trial not in per_video_frame_logits, trial
                per_video_frame_logits[trial] = {
                    'labels': np.asarray(
                        labels[j, :true_lens[j]]).flatten(),
                    'logits': np.asarray(out[j][:true_lens[j]],
                                         dtype=np.float32),
                }

        # with precrop on, the loader emits 40^2 frames directly: the
        # crop rides the native resize's weight matrices (zero extra
        # copies, 31% smaller pad/stack buffers); maybe_precrop below
        # stays as the bit-identical fallback for 48^2 batches from any
        # path that didn't crop (e.g. EvalLoader.__iter__ users)
        batch_iter = loader.batches(batch_videos,
                                    windowed_threshold=win_threshold,
                                    center_crop=(CROP_SIZE if precrop
                                                 else None))
        while True:
            t0 = _pc()
            nxt = next(batch_iter, None)
            tm['loader_s'] += _pc() - t0
            if nxt is None:
                break
            batch, trials, true_lens, bucket = nxt
            labels = batch.pop(constants.EXPR)  # (B, bucket)
            t0 = _pc()
            batch = maybe_precrop(batch)
            tm['dispatch_s'] += _pc() - t0

            windowed = (win_threshold is not None and len(trials) == 1
                        and true_lens[0] > win_threshold)
            if windowed and getattr(self.args, 'eval_device_windows',
                                    True):
                dispatch_video_windows(batch, labels, trials[0],
                                       true_lens[0])
            elif windowed:
                enqueue_windowed(batch, labels, trials[0], true_lens[0])
                dispatch_window_batches()
            else:
                # async H2D (jnp.asarray can block on the transfer)
                t0 = _pc()
                inputs = {k: jax.device_put(maybe_cast(v))
                          for k, v in batch.items()}
                tm['h2d_bytes'] += sum(
                    v.nbytes // (2 if cast_feats and
                                 v.dtype == np.float32 else 1)
                    for v in batch.values())
                if self.needs_mask:
                    out = self.eval_step(
                        self.state.params, self.state.batch_stats, inputs,
                        jnp.asarray(np.asarray(true_lens, np.int32)))
                else:
                    out = self.eval_step(self.state.params,
                                         self.state.batch_stats, inputs)
                pending.append(('bucket', out, labels, trials, true_lens))
                tm['dispatch_s'] += _pc() - t0
            while len(pending) > 2:
                collect(pending.popleft())

        dispatch_window_batches(flush=True)
        while pending:
            collect(pending.popleft())
        assert not wstate and not wqueue, (list(wstate), len(wqueue))

        # canonical (work-list) order for the artifact contract; assert
        # coverage first so a path that skipped (or double-emitted) a
        # trial fails with a diagnosable message, not a bare KeyError
        want = {item[1] for item in loader.work_list}
        got = set(per_video_frame_logits)
        assert got == want, (
            f"inference coverage gap: missing={sorted(want - got)[:5]} "
            f"extra={sorted(got - want)[:5]}")
        per_video_frame_logits = {
            item[1]: per_video_frame_logits[item[1]]
            for item in loader.work_list}

        perf = M.compute_perf(per_video_frame_logits,
                              self.args.dataset_name,
                              self.args.use_other_class)

        if self.args.dataset_name == constants.C_EXPR_DB_CHALLENGE:
            out_inf = join(self.args.outd,
                           f'pred-{constants.C_EXPR_DB_CHALLENGE}')
            os.makedirs(out_inf, exist_ok=True)
            with open(join(out_inf, 'prediction.pkl'), 'wb') as f:
                pkl.dump(per_video_frame_logits, f,
                         protocol=pkl.HIGHEST_PROTOCOL)
            log(f"Dumped {constants.C_EXPR_DB_CHALLENGE} predictions at "
                f"{join(out_inf, 'prediction.pkl')}")

        return perf, per_video_frame_logits

    # --------------------------------------------------------------- driver
    def optimize(self, train_loader: TrainLoader, valid_loader: EvalLoader,
                 test_loader: EvalLoader, checkpointer=None):
        log(fmsg(f"Starting training on {jax.default_backend()} "
                 f"({len(jax.devices())} device(s))"))
        t_start = time.time()
        host = lambda tree: jax.tree.map(np.asarray, tree)  # noqa: E731

        from fvt_tpu.train.steps import split_frozen

        def host_best():
            """Best-model copy: trainable params + batch stats only (the
            frozen spatial backbone never changes — don't duplicate its
            25M params per criterion)."""
            trainable, _ = split_frozen(self.state.params)
            return (host(trainable), host(self.state.batch_stats))

        def to_live(best):
            params, stats = best
            _, frozen = split_frozen(self.state.params)
            merged = {**jax.tree.map(jnp.asarray, params), **frozen}
            return merged, jax.tree.map(jnp.asarray, stats)

        start_epoch = 0
        valid_tracker = None
        restored = None
        if checkpointer is not None and getattr(checkpointer,
                                                'allow_restore', True):
            restored = checkpointer.restore(self.state,
                                            scheduler=self.scheduler)
        if restored is not None:
            (last_epoch, self.state, valid_tracker, best_params,
             loss_tracker) = restored
            start_epoch = last_epoch + 1
        if self.scheduler is not None:
            # fresh runs too: torch schedulers set the initial param-group
            # lr at construction, so epoch 0 must train at scheduler.lr(0)
            # (warmup ramp / MYCOSINE coef / milestone-0), not raw hp.lr
            self.state = self.state.replace(opt_state=optim.set_lr(
                self.state.opt_state, self.scheduler.lr(start_epoch)))
        if valid_tracker is None:
            current_perf, _ = self.inference(valid_loader)
            valid_tracker = M.build_trackers(self.args.dataset_name,
                                             self.args.use_other_class)
            best_params = {}
            loss_tracker = []
            for item in valid_tracker:
                valid_tracker[item].append(current_perf)
                best_params[item] = host_best()
                log(f"{constants.VALIDSET}: "
                    f"{valid_tracker[item].current_status_str}")
                log(f"{constants.VALIDSET}: "
                    f"{valid_tracker[item].best_status_str}")

        test_tracker = M.build_trackers(self.args.dataset_name,
                                        self.args.use_other_class)

        if isinstance(self.scheduler, optim.MyWarmupSchedule) and \
                self.scheduler.mode == 'min' and \
                self.args.task == constants.CLASSIFICATION:
            log("WARNING: MYWARMUP plateau metric is the validation master "
                "(W-F1: higher is better) but opt__mode is MIN — set "
                "--opt__mode max to count plateaus correctly")

        stopper = EarlyStopper(getattr(self.args, 'early_stopping', 0),
                               self.args.min_num_epochs)
        if restored is not None:
            counter = getattr(checkpointer, 'restored_stopper_counter',
                              None)
            if counter is not None:
                # resume the no-improvement countdown where it left off
                stopper.counter = int(counter)

        for epoch in range(start_epoch, self.args.num_epochs):
            epoch_loss = self.train_one_epoch(train_loader, epoch)
            loss_tracker.append(epoch_loss)

            current_perf, _ = self.inference(valid_loader)
            improved = False
            for item in valid_tracker:
                # best-model copy keeps the reference's `>=` semantics
                # (metrics.py:410: a tie refreshes the best snapshot),
                # but the early-stop countdown resets only on a STRICT
                # improvement, like the legacy trainer it models
                # (/root/reference/trainer.py:228 uses `>`): an exact
                # plateau is not an improvement.
                prev_best = valid_tracker[item].best_value
                valid_tracker[item].append(current_perf)
                if valid_tracker[item].is_last_best:
                    best_params[item] = host_best()
                    if (prev_best is None
                            or valid_tracker[item].best_value > prev_best):
                        improved = True
                log(f"{constants.VALIDSET}: "
                    f"{valid_tracker[item].current_status_str}")
                log(f"{constants.VALIDSET}: "
                    f"{valid_tracker[item].best_status_str}")

            # metric-driven schedulers (MYWARMUP plateau decay) consume
            # the VALIDATION master metric, like the reference legacy path
            # fed valid CCC (base/trainer.py:275); opt__mode must match
            # its direction (MAX for F1 metrics).  Pure-epoch schedules
            # ignore step().
            if isinstance(self.scheduler, optim.MyWarmupSchedule):
                try:
                    first = next(iter(valid_tracker.values()))
                    metric = first._master_value(current_perf)
                except (KeyError, StopIteration):
                    metric = epoch_loss
                self.scheduler.step(epoch, metric)
                self.state = self.state.replace(opt_state=optim.set_lr(
                    self.state.opt_state, self.scheduler.lr(epoch + 1)))

            # apply this epoch's countdown update BEFORE checkpointing so
            # the saved counter is the post-epoch value — a resumed run
            # then continues the countdown exactly where an uninterrupted
            # one would (saving the pre-update counter gave a resumed run
            # one extra no-improvement epoch)
            stop = stopper.should_stop(epoch, improved)

            if checkpointer is not None and checkpointer.should_save(epoch):
                checkpointer.save(epoch, self.state, valid_tracker,
                                  best_params, loss_tracker,
                                  scheduler=self.scheduler,
                                  stopper_counter=stopper.counter)

            if stop:
                log(fmsg(f"Early stopping at epoch {epoch}: no validation "
                         f"improvement in {stopper.budget} epochs"))
                break

        self.fit_finished = True

        # test each best model (trainer.py:716-750)
        log(fmsg(f"{constants.TESTSET} performance:"))
        live_state = self.state
        for item in best_params:
            merged, stats = to_live(best_params[item])
            self.state = live_state.replace(params=merged,
                                            batch_stats=stats)
            current_perf, per_video = self.inference(test_loader)
            test_tracker[item].append(current_perf)
            log(f"{constants.TESTSET}: "
                f"{test_tracker[item].current_status_str}")

            with open(join(self.args.outd,
                           f"{constants.TESTSET}-{item}-perf.txt"),
                      'w') as f:
                f.write(test_tracker[item].report(current_perf,
                                                  self.int_to_cl))
            with open(join(self.args.outd,
                           f"{constants.TESTSET}-{item}-perf.pkl"),
                      'wb') as f:
                pkl.dump(current_perf, f, protocol=pkl.HIGHEST_PROTOCOL)
            with open(join(self.args.outd,
                           f"pred-per-frame-{constants.TESTSET}"
                           f"-{item}-perf.pkl"), 'wb') as f:
                pkl.dump(per_video, f, protocol=pkl.HIGHEST_PROTOCOL)

        self.state = live_state

        # persist best models (trainer.py:752-768); the artifact carries
        # the FULL param tree (frozen backbone merged back in) so it loads
        # standalone via load_best_model
        dir_best = join(self.args.outd, 'best-models')
        for item in best_params:
            merged, stats = to_live(best_params[item])
            _dir = join(dir_best, f"{item}")
            os.makedirs(_dir, exist_ok=True)
            with open(join(_dir, 'model.msgpack'), 'wb') as f:
                f.write(serialization.to_bytes(
                    {'params': jax.tree.map(np.asarray, merged),
                     'batch_stats': jax.tree.map(np.asarray, stats)}))
            self.save_args(join(_dir, 'config.yml'))

        if getattr(self.args, 'save_plot', False):
            # honor the reference's save_plot knob (its live loop never
            # uses it): one master-metric curve per selection criterion
            for item in valid_tracker:
                valid_tracker[item].plot(
                    join(self.args.outd, f'tracker-{item}.png'),
                    loss_tracker)

        self.args.tend = dt.datetime.now()
        self.save_args(join(self.args.outd, 'config.yml'))
        self.bye(t_start)
        return valid_tracker, test_tracker

    def load_best_model(self, path: str):
        """Load a best-models/<item>/model.msgpack into the live state."""
        with open(path, 'rb') as f:
            data = serialization.from_bytes(
                {'params': self.state.params,
                 'batch_stats': self.state.batch_stats}, f.read())
        self.state = self.state.replace(
            params=jax.tree.map(jnp.asarray, data['params']),
            batch_stats=jax.tree.map(jnp.asarray, data['batch_stats']))

    def save_args(self, path: str):
        cfg = {k: (str(v) if isinstance(v, dt.datetime) else v)
               for k, v in vars(self.args).items()}
        with open(path, 'w') as f:
            yaml.dump(cfg, f)

    def bye(self, t_start: float):
        log(fmsg(f"Total time: {time.time() - t_start:.1f}s"))
        with open(join(self.args.outd, 'passed.txt'), 'w') as f:
            f.write('Passed.')
        log(fmsg('bye.'))
