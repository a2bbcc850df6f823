"""Checkpoint/resume: interrupted training continues with identical
tracker state and produces the final artifacts."""
import os
from os.path import join

import numpy as np
import pytest

from synth_store import make_meld_store


def _args(store, outd, epochs, resume=False):
    return [
        '--dataset_name', 'MELD',
        '--dataset_path', store['dataset_path'],
        '--folds_dir', store['folds_dir'],
        '--modality', 'vggish+bert+EXPR_continuous_label',
        '--model_name', 'LFAN',
        '--num_epochs', str(epochs),
        '--train_batch_size', '4',
        '--num_workers', '1',
        '--window_length', '12',
        '--hop_length', '8',
        '--eval_bucket_quantum', '12',
        '--outd', outd,
        '--checkpoint_every', '1',
        '--resume', 'true' if resume else 'false',
    ]


def test_checkpoint_resume(tmp_path):
    store = make_meld_store(str(tmp_path / 'store'), n_train=8, n_val=4,
                            n_test=4, min_len=6, max_len=20)
    from fvt_tpu.main import main

    # run 1: train 1 epoch with checkpointing
    outd = str(tmp_path / 'exp')
    main(_args(store, outd, epochs=1))
    assert os.path.isdir(join(outd, 'checkpoints'))
    assert os.path.isfile(join(outd, 'passed.txt'))

    # simulate interruption: remove the pass gate, extend epochs, resume
    os.remove(join(outd, 'passed.txt'))
    main(_args(store, outd, epochs=2, resume=True))
    assert os.path.isfile(join(outd, 'passed.txt'))

    # log contains the restore line
    with open(join(outd, 'log.txt')) as f:
        logtxt = f.read()
    assert 'restored checkpoint from epoch 0' in logtxt
    # the resumed run must NOT retrain epoch 0 (a restore that resets
    # the loop to 0 would double-train and corrupt tracker history)
    assert 'Train epoch (0/2)' not in logtxt
    # and training continued (epoch 1 ran, epoch 0 NOT re-run post-restore)
    assert 'Train epoch (1/2)' in logtxt


def test_mywarmup_scheduler_state_survives_resume(tmp_path):
    """A plateau-decayed MYWARMUP lr must NOT reset to base_lr on resume."""
    import jax.numpy as jnp
    from fvt_tpu.train.checkpoint import Checkpointer
    from fvt_tpu.train.steps import TrainState
    from fvt_tpu.train.optim import MyWarmupSchedule
    from fvt_tpu.train.metrics import PerfTracker

    state = TrainState(params={'w': jnp.zeros((2,))}, batch_stats={},
                       opt_state={'x': jnp.zeros(())},
                       step=jnp.zeros((), jnp.int32))
    sched = MyWarmupSchedule(0.01, patience=0, factor=0.5,
                             num_warmup_epoch=1)
    # drive two plateau decays past warmup
    sched.step(0, metric=1.0)
    sched.step(1, metric=2.0)
    sched.step(2, metric=2.0)
    assert sched.current_lr < 0.01

    tr = PerfTracker()
    ck = Checkpointer(str(tmp_path), every=1)
    ck.save(2, state, {'None': tr}, {}, [1.0, 2.0, 2.0], scheduler=sched)

    fresh = MyWarmupSchedule(0.01, patience=0, factor=0.5,
                             num_warmup_epoch=1)
    ck2 = Checkpointer(str(tmp_path), every=1)
    restored = ck2.restore(state, scheduler=fresh)
    assert restored is not None
    assert fresh.current_lr == sched.current_lr
    assert fresh.best == sched.best
    assert fresh.num_bad_epochs == sched.num_bad_epochs
    # the lr the trainer would adopt after restore continues the decay
    assert fresh.lr(3) == sched.current_lr


def test_stopper_counter_survives_resume(tmp_path):
    """The EarlyStopper no-improvement countdown is checkpointed; a
    resumed run must not reset its budget (it would train up to
    `budget` extra non-improving epochs vs an uninterrupted run)."""
    import jax.numpy as jnp
    import optax
    from types import SimpleNamespace
    from fvt_tpu.train.checkpoint import Checkpointer
    from fvt_tpu.train.metrics import build_trackers

    state = SimpleNamespace(
        params={'dense': {'kernel': jnp.ones((2, 2))}},
        batch_stats={}, opt_state=optax.sgd(0.1).init(
            {'dense': {'kernel': jnp.ones((2, 2))}}),
        step=jnp.asarray(3),
        replace=None)

    class S:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def replace(self, **kw):
            d = dict(self.__dict__)
            d.update(kw)
            return S(**d)

    state = S(params=state.params, batch_stats={}, opt_state=state.opt_state,
              step=state.step)

    cp = Checkpointer(str(tmp_path), every=1)
    trackers = build_trackers('MELD', use_other_class=False)
    cp.save(0, state, trackers, best_params={}, loss_tracker=[1.0],
            stopper_counter=2)
    out = cp.restore(state)
    assert out is not None
    assert cp.restored_stopper_counter == 2


def test_restore_falls_back_when_meta_sidecar_missing(tmp_path):
    """A crash between the orbax array save and the meta-sidecar write
    leaves a step with arrays but no meta_<step>.pkl; restore() must
    fall back to the newest step that has BOTH halves instead of
    raising FileNotFoundError (which would brick --resume)."""
    import jax.numpy as jnp
    import optax
    from fvt_tpu.train.checkpoint import Checkpointer
    from fvt_tpu.train.metrics import build_trackers

    class S:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def replace(self, **kw):
            d = {k: v for k, v in self.__dict__.items()}
            d.update(kw)
            return S(**d)

    params = {'dense': {'kernel': jnp.ones((2, 2))}}
    state = S(params=params, batch_stats={},
              opt_state=optax.sgd(0.1).init(params),
              step=jnp.asarray(0))

    cp = Checkpointer(str(tmp_path), every=1)
    trackers = build_trackers('MELD', use_other_class=False)
    cp.save(0, state, trackers, best_params={}, loss_tracker=[2.0],
            stopper_counter=5)
    cp.save(1, state, trackers, best_params={}, loss_tracker=[2.0, 1.5],
            stopper_counter=4)
    # simulate the crash window: step 1 has arrays but no meta
    os.remove(join(cp.dir, 'meta_1.pkl'))

    out = cp.restore(state)
    assert out is not None
    epoch, _, _, _, losses = out
    assert epoch == 0 and losses == [2.0]
    assert cp.restored_stopper_counter == 5

    # nothing restorable at all -> None, not an exception
    os.remove(join(cp.dir, 'meta_0.pkl'))
    assert cp.restore(state) is None
