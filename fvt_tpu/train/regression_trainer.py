"""Legacy VA-regression fit loop — the reference's
GenericVideoTrainer.fit / loop (/root/reference/base/trainer.py:118-316)
composed from the fvt_tpu pieces (REGRESSION train step + CCC loss,
compute_regression_perf, regression_viz CSV/plots, optim schedulers).

Faithful semantics, each pinned by tests/test_regression_trainer.py:

  * epoch loss = sum of per-batch MEAN losses divided by the number of
    SEQUENCES seen (not batches) — base/trainer.py:261+280+290;
  * per-frame outputs AND labels of overlapping windows are averaged
    per trial (ContinuousOutputHandler, base/logger.py:89-129) — here
    one scatter-add accumulation per trial, train records taken from
    the SAME train-mode forward that produced the loss
    (base/trainer.py:276-286 → steps.make_train_step(with_outputs));
  * best model selected by validation CCC ('overall' concatenated
    partition), weights snapshotted + persisted (base/trainer.py:168-185);
  * early stopping only after ``min_epoch``, counter reset on
    improvement, else decremented; exhaustion marks fit_finished and the
    NEXT epoch breaks (the stopping epoch itself completes, including
    the scheduler step) — base/trainer.py:213-221+135-139;
  * scheduler stepped per epoch on the VALIDATION LOSS
    (base/trainer.py:223); warmup at epoch granularity (the per-batch
    ramp caveat is documented on optim.MyWarmupSchedule);
  * at a milestone epoch (or when the lr falls under the floor) the
    best weights are reloaded and an optional ParamControl releases the
    next staged group — re-freezing the base optimizer, rebuilding the
    jitted step, re-initializing the optimizer state, and halting when
    the stack is exhausted (base/trainer.py:140-149);
  * ``load_best_at_each_epoch`` restores the running best after every
    epoch (base/trainer.py:228-229); fit always ends on the best
    weights (base/trainer.py:233).

Batch protocol (mirrors the reference dataloader tuple,
base/trainer.py:254): iterables yield ``(X, trials, lengths, indices)``
where X holds one window of each modality (B, w, ...) plus a
``*continuous_label`` stream (B, w), ``trials`` names the source video
per row, ``lengths`` is the full trial length, and ``indices`` (B, w)
maps window frames into the trial.
"""
from __future__ import annotations

import os
import pickle
from os.path import join
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from fvt_tpu import constants
from fvt_tpu.train import optim
from fvt_tpu.train import regression_viz as RV
from fvt_tpu.train.losses import ccc_loss
from fvt_tpu.train.metrics import compute_regression_perf
from fvt_tpu.train.steps import (create_train_state, label_key,
                                 make_eval_step, make_train_step)
from fvt_tpu.utils import rng as rng_mod
from fvt_tpu.utils.logger import log


class RegressionTrainer:
    """See module docstring.  ``args`` needs the optimizer/scheduler
    hyperparameters plus num_epochs / min_num_epochs / early_stopping /
    seed / outd (and optionally milestone, load_best_at_each_epoch,
    save_plot)."""

    def __init__(self, model, args, param_control=None):
        self.model = model
        self.args = args
        hp = optim.standardize_opt_params(vars(args))
        self.hp = hp
        # the UNWRAPPED optimizer: param_control re-freezes it at each
        # release (the reference rebuilds its optimizer the same way,
        # base/parameter_control.py release -> get_optimizer)
        self._base_optimizer = optim.build_optimizer(hp)
        self.optimizer = self._base_optimizer
        self.scheduler = optim.build_scheduler(
            hp, args.num_epochs, args.min_num_epochs)
        self.train_step = make_train_step(model, self.optimizer,
                                          task=constants.REGRESSION,
                                          with_outputs=True)
        self.eval_step = make_eval_step(model)
        self.param_control = param_control

        emo = getattr(args, 'emotion', None)
        # '???' is the reference configs.py placeholder on the
        # classification datasets; VA runs name a real dimension
        self.emotion = emo if emo and emo != '???' else 'valence'
        self.state = None
        self.start_epoch = 0
        self.fit_finished = False
        self.early_stopping_counter = int(
            getattr(args, 'early_stopping', 0))
        # base/trainer.py:131-135
        self.best = {'params': None, 'batch_stats': None,
                     'loss': 1e10, 'ccc': -1e10, 'epoch': 0}

    # ------------------------------------------------------------- state
    def init_state(self, sample_batch: Dict[str, np.ndarray]):
        key = rng_mod.root_key(self.args.seed)
        batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
        self.state = create_train_state(self.model, self.optimizer, batch,
                                        rng_mod.fold_key(key, 'init'))
        if self.param_control is not None:
            # start frozen to the base patterns (ResnetParamControl
            # semantics: staged groups are locked until a release)
            self._rewrap_optimizer()
        return self.state

    def _rewrap_optimizer(self):
        """Re-freeze the base optimizer to param_control's CURRENT
        patterns, rebuild the jitted step, and re-init the optimizer
        state (the reference rebuilds its optimizer at each release)."""
        from fvt_tpu.train.param_control import freeze
        from fvt_tpu.train.steps import split_frozen
        trainable, _ = split_frozen(self.state.params)
        self.optimizer = freeze(self._base_optimizer, trainable,
                                self.param_control.current_patterns())
        self.train_step = make_train_step(self.model, self.optimizer,
                                          task=constants.REGRESSION,
                                          with_outputs=True)
        self.state = self.state.replace(
            opt_state=self.optimizer.init(trainable))

    def _snapshot_best(self, val_loss: float, ccc: float, epoch: int):
        self.best = {
            'params': jax.tree.map(np.asarray, self.state.params),
            'batch_stats': jax.tree.map(np.asarray,
                                        self.state.batch_stats),
            'loss': float(val_loss), 'ccc': float(ccc), 'epoch': epoch}

    def _restore_best(self):
        if self.best['params'] is not None:
            self.state = self.state.replace(
                params=jax.tree.map(jnp.asarray, self.best['params']),
                batch_stats=jax.tree.map(jnp.asarray,
                                         self.best['batch_stats']))

    # -------------------------------------------------------- checkpoint
    CKPT_NAME = 'checkpoint.pkl'  # the reference's filename

    def save_checkpoint(self):
        """Per-epoch resume blob.  The reference pickles the WHOLE
        trainer + param controller (base/checkpointer.py:37-44); here
        the explicit resume fields: full TrainState (params, batch
        stats, optimizer momentum, step counter), best snapshot,
        early-stopping countdown, scheduler plateau state."""
        pc = self.param_control
        blob = {'start_epoch': self.start_epoch,
                'fit_finished': self.fit_finished,
                'early_stopping_counter': self.early_stopping_counter,
                'best': self.best,
                'state': serialization.to_state_dict(
                    jax.tree.map(np.asarray, self.state)),
                'scheduler': (self.scheduler.state_dict()
                              if self.scheduler is not None else None),
                'param_control': (None if pc is None else
                                  {'released': pc.released,
                                   'release_count': pc.release_count,
                                   'early_stop': pc.early_stop})}
        tmp = join(self.args.outd, self.CKPT_NAME + '.tmp')
        with open(tmp, 'wb') as f:
            pickle.dump(blob, f)
        os.replace(tmp, join(self.args.outd, self.CKPT_NAME))

    def load_checkpoint(self):
        """resume=1 (base/checkpointer.py:22-35).  Call AFTER
        init_state — the live state pytree is the deserialization
        template."""
        assert self.state is not None, 'init_state first'
        with open(join(self.args.outd, self.CKPT_NAME), 'rb') as f:
            blob = pickle.load(f)
        pc = blob.get('param_control')
        if self.param_control is not None and pc is not None:
            # reconstruct the release stage FIRST: the wrapped optimizer
            # state is the deserialization template for blob['state']
            self.param_control.released = int(pc['released'])
            self.param_control.release_count = int(pc['release_count'])
            self.param_control.early_stop = bool(pc['early_stop'])
            self._rewrap_optimizer()
        self.state = jax.tree.map(jnp.asarray, serialization
                                  .from_state_dict(self.state,
                                                   blob['state']))
        self.start_epoch = int(blob['start_epoch'])
        self.fit_finished = bool(blob['fit_finished'])
        self.early_stopping_counter = int(blob['early_stopping_counter'])
        self.best = blob['best']
        if self.scheduler is not None and blob['scheduler'] is not None:
            self.scheduler.load_state_dict(blob['scheduler'])

    # -------------------------------------------------------------- loop
    @staticmethod
    def _accumulate(acc: Dict[str, dict], trials, lengths, indices,
                    **rows: np.ndarray):
        """Scatter one batch of per-window rows (one named array per
        stream, e.g. sums=outputs, labsums=labels) into the per-trial
        per-frame accumulators (ContinuousOutputHandler,
        base/logger.py:89-129; the handler stops at the trial length).
        Window coverage is counted once per frame."""
        w = min(arr.shape[1] for arr in rows.values())
        for i, trial in enumerate(trials):
            a = acc.get(trial)
            if a is None:
                a = acc[trial] = {k: np.zeros(int(lengths[i]))
                                  for k in (*rows, 'counts')}
            k = min(int(lengths[i]), w)
            idx = np.asarray(indices[i][:k], np.int64)
            for key, arr in rows.items():
                np.add.at(a[key], idx, arr[i, :k])
            np.add.at(a['counts'], idx, 1.0)

    @staticmethod
    def _finalize(a: dict, key: str, trial: str) -> np.ndarray:
        """Per-frame average; frames covered by NO window fail loudly
        like the reference (statistics.mean on an empty per-frame list,
        base/logger.py:110-119) — fabricating (0, 0) pairs would
        silently distort the CCC that drives best-model selection."""
        uncovered = int((a['counts'] == 0).sum())
        if uncovered:
            raise ValueError(
                f'trial {trial}: {uncovered} frames covered by no '
                f'window — the window/hop plan must tile each trial')
        return a[key] / a['counts']

    def loop(self, loader: Iterable, epoch: Optional[int],
             train_mode: bool):
        """One pass (base/trainer.py:236-316): returns
        (epoch_loss, perf, per_video records {'labels','preds'})."""
        assert self.state is not None, 'init_state first'
        epoch_key = rng_mod.fold_key(rng_mod.root_key(self.args.seed),
                                     'epoch', epoch or 0)
        running_loss, n_seqs = 0.0, 0
        acc: Dict[str, dict] = {}  # trial -> sums/labsums/counts

        for X, trials, lengths, indices in loader:
            n_seqs += len(trials)
            lkey = label_key(X)
            jbatch = {k: jnp.asarray(v) for k, v in X.items()}
            if train_mode:
                self.state, loss, out = self.train_step(
                    self.state, jbatch, epoch_key)
            else:
                inputs = {k: v for k, v in jbatch.items() if k != lkey}
                out = self.eval_step(self.state.params,
                                     self.state.batch_stats, inputs)
                loss = ccc_loss(jbatch[lkey].astype(out.dtype),
                                out[..., 0])
            running_loss += float(loss)

            self._accumulate(acc, trials, lengths, indices,
                             sums=np.asarray(out[..., 0], np.float64),
                             labsums=np.asarray(X[lkey], np.float64))

        per_video = {
            trial: {'labels': self._finalize(a, 'labsums', trial),
                    'preds': self._finalize(a, 'sums', trial)}
            for trial, a in acc.items()}
        # sum of batch-mean losses over the number of sequences
        # (base/trainer.py:261+290) — a reference quirk, kept verbatim
        epoch_loss = running_loss / max(n_seqs, 1)
        return epoch_loss, compute_regression_perf(per_video), per_video

    # --------------------------------------------------------------- fit
    def fit(self, train_loader_fn: Callable[[int], Iterable],
            valid_loader_fn: Callable[[], Iterable]):
        """base/trainer.py:118-233.  ``train_loader_fn(epoch)`` yields a
        fresh train pass; ``valid_loader_fn()`` a validation pass."""
        outd = self.args.outd
        os.makedirs(outd, exist_ok=True)
        if self.start_epoch == 0:  # a resumed run appends to its rows
            RV.init_epoch_csv(outd)
        milestones = set(optim.parse_milestones(
            getattr(self.args, 'milestone', None)))

        for epoch in range(self.start_epoch, self.args.num_epochs):
            if self.fit_finished:
                log('regression fit: early stop')
                break
            lr_floor = (self.scheduler is not None
                        and self.scheduler.lr(epoch)
                        < getattr(self.hp, 'min_lr', 0.0))
            if epoch in milestones or lr_floor:
                # release the next staged param group and restart from
                # the running best (base/trainer.py:140-149; the lr
                # floor is the reference's second release trigger)
                if self.param_control is not None:
                    from fvt_tpu.train.steps import split_frozen
                    self.param_control.release(
                        self._base_optimizer,
                        split_frozen(self.state.params)[0])
                    if self.param_control.early_stop:
                        log('regression fit: param_control exhausted — '
                            'early stop (base/trainer.py:145-146)')
                        break
                    self._rewrap_optimizer()
                self._restore_best()
            if self.scheduler is not None:
                self.state = self.state.replace(
                    opt_state=optim.set_lr(self.state.opt_state,
                                           self.scheduler.lr(epoch)))

            tr_loss, tr_perf, tr_records = self.loop(
                train_loader_fn(epoch), epoch, train_mode=True)
            val_loss, val_perf, val_records = self.loop(
                valid_loader_fn(), epoch, train_mode=False)
            self._save_trialwise(tr_records, tr_perf, True, epoch)
            self._save_trialwise(val_records, val_perf, False, epoch)

            improvement = val_perf['ccc'] > self.best['ccc']
            if improvement:  # base/trainer.py:168-185
                self._snapshot_best(val_loss, val_perf['ccc'], epoch)
                self._save_best(outd)

            lr = (self.scheduler.lr(epoch) if self.scheduler is not None
                  else self.args.opt__lr)
            RV.append_epoch_csv(outd, epoch, self.best['epoch'], lr,
                                tr_loss, val_loss, tr_perf, val_perf)
            if getattr(self.args, 'save_plot', False):
                RV.save_output_vs_label_plots(val_records, val_perf, outd,
                                              epoch, train_mode=False)
            log(f'regression epoch {epoch}: train {tr_loss:.4f} '
                f'valid {val_loss:.4f} ccc {val_perf["ccc"]:.4f} '
                f'best@{self.best["epoch"]}')

            # base/trainer.py:213-221 (gated on the CONFIG value, like
            # the reference — the counter itself may legally reach 0)
            if (int(getattr(self.args, 'early_stopping', 0))
                    and epoch > self.args.min_num_epochs):
                if improvement:
                    self.early_stopping_counter = int(
                        self.args.early_stopping)
                else:
                    self.early_stopping_counter -= 1
                if self.early_stopping_counter <= 0:
                    self.fit_finished = True

            if self.scheduler is not None:
                self.scheduler.step(epoch, metric=val_loss)
            if getattr(self.args, 'load_best_at_each_epoch', False):
                self._restore_best()
            # checkpoint LAST, after the scheduler step, like the
            # reference (base/trainer.py:224-231)
            self.start_epoch = epoch + 1
            self.save_checkpoint()

        self.fit_finished = True
        self.save_checkpoint()  # base/trainer.py:226-228
        self._restore_best()  # base/trainer.py:233
        return self.best

    def _save_best(self, outd: str):
        """model_state_dict persistence (base/trainer.py:169-170), in the
        repo's msgpack container (same layout Trainer.load_best_model
        reads)."""
        with open(join(outd, 'model_state_dict.msgpack'), 'wb') as f:
            f.write(serialization.to_bytes(
                {'params': self.best['params'],
                 'batch_stats': self.best['batch_stats']}))

    def _save_trialwise(self, per_video: Dict[str, dict], perf: dict,
                        train_mode: bool, epoch: Optional[int]):
        """Trial-wise records pkl in the reference layout
        (base/logger.py:354-380 save_trial_wise_records/get_save_path):
        ``dict/<emotion>/{train|validate}/epoch_<e>.pkl`` per epoch,
        ``dict/<emotion>/test.pkl`` for the final pass — outputs,
        continuous labels, and per-trial + 'overall' rmse/pcc/ccc
        (pcc stored as a float; the p-value the reference keeps was
        never consumed)."""
        base = join(self.args.outd, 'dict', self.emotion)
        if epoch is None:
            path = join(base, 'test.pkl')
        else:
            sub = 'train' if train_mode else 'validate'
            path = join(base, sub, f'epoch_{epoch}.pkl')
        os.makedirs(os.path.dirname(path), exist_ok=True)
        metrics = {t: compute_regression_perf({t: rec})
                   for t, rec in per_video.items()}
        metrics['overall'] = perf
        with open(path, 'wb') as f:
            pickle.dump({'output': {t: r['preds']
                                    for t, r in per_video.items()},
                         'continuous_label': {t: r['labels']
                                              for t, r in
                                              per_video.items()},
                         'metrics': metrics}, f)
        return path

    # ----------------------------------------------------------- predict
    def predict(self, loader_fn: Callable[[], Iterable], partition: str,
                emotion: str = 'valence') -> Dict[str, np.ndarray]:
        """Label-free prediction pass (base/trainer.py:318-342
        predict_loop): averaged per-frame outputs per trial, written as
        ``predict/<partition>/<emotion>/<trial>.txt`` — one header line
        naming the emotion, one value per frame (the reference's
        single-column pandas to_csv)."""
        assert self.state is not None, 'init_state first'
        acc: Dict[str, dict] = {}
        for X, trials, lengths, indices in loader_fn():
            inputs = {k: jnp.asarray(v) for k, v in X.items()
                      if 'label' not in k}
            out = self.eval_step(self.state.params,
                                 self.state.batch_stats, inputs)
            self._accumulate(acc, trials, lengths, indices,
                             sums=np.asarray(out[..., 0], np.float64))

        outd = join(self.args.outd, 'predict', partition, emotion)
        os.makedirs(outd, exist_ok=True)
        written = {}
        for trial, a in acc.items():
            preds = self._finalize(a, 'sums', trial)
            with open(join(outd, f'{trial}.txt'), 'w') as f:
                f.write(emotion + '\n')
                f.write('\n'.join(str(v) for v in preds) + '\n')
            written[trial] = preds
        return written

    # -------------------------------------------------------------- test
    def test(self, test_loader_fn: Callable[[], Iterable]):
        """Final held-out pass on the best weights: metrics row +
        test plots (base/trainer.py:60-72 + checkpointer.py:62-65)."""
        self._restore_best()
        loss, perf, records = self.loop(test_loader_fn(), None,
                                        train_mode=False)
        self._save_trialwise(records, perf, False, None)
        RV.append_test_csv(self.args.outd, perf)
        if getattr(self.args, 'save_plot', False):
            RV.save_output_vs_label_plots(records, perf, self.args.outd,
                                          epoch=None)
        return loss, perf, records
