"""Train-time bucketed padding (--train_bucketed).

The reference pads every short train clip by repeating its last frame up
to the FULL model window (base/dataset.py:570-582) — on MELD-length
clips that is 3-4x repeated-frame compute.  Bucketed mode pads only to
the next train_bucket_quantum multiple (flag-gated: the per-frame loss
weighting diverges from the reference when fewer frames are repeated).
"""
import numpy as np
import pytest

from types import SimpleNamespace

from fvt_tpu import constants
from fvt_tpu.config.defaults import get_config
from fvt_tpu.data.loader import TrainLoader, round_up
from fvt_tpu.experiment import Experiment
from synth_store import make_meld_store


WINDOW = 16


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('tbstore'))
    store = make_meld_store(root, n_train=12, n_val=3, n_test=3,
                            min_len=4, max_len=30)
    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='vggish+bert+EXPR_continuous_label',
               window_length=WINDOW, hop_length=8,
               train_batch_size=4, num_workers=1,
               calc_mean_std=True, seed=0,
               train_bucketed=True, train_bucket_quantum=8)
    args = SimpleNamespace(**cfg)
    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    return args, exp, loaders


def _batch_fingerprints(loader, epoch=0):
    out = []
    for batch in loader.epoch(epoch):
        key = batch[constants.EXPR]
        out.append((key.shape, key.tobytes()))
    return out


def test_quantum_equal_to_window_reproduces_reference_batches(setup):
    args, exp, loaders = setup
    train = loaders[constants.TRAINSET]
    ref = TrainLoader(train.work_list, train.builder,
                      batch_size=4, seed=0, num_threads=1)
    same = TrainLoader(train.work_list, train.builder,
                       batch_size=4, seed=0, num_threads=1,
                       bucket_quantum=WINDOW)
    a = _batch_fingerprints(ref)
    b = _batch_fingerprints(same)
    # one bucket -> same batch contents; only the batch ORDER is
    # re-shuffled by the bucket permutation
    assert sorted(a) == sorted(b)


def test_bucketed_batches_shapes_and_content(setup):
    args, exp, loaders = setup
    train = loaders[constants.TRAINSET]
    assert train.bucket_quantum == 8

    frames_bucketed = 0
    seen_shapes = set()
    for batch in train.epoch(0):
        t = batch[constants.EXPR].shape[1]
        assert t % 8 == 0 and t <= WINDOW
        seen_shapes.add(t)
        frames_bucketed += batch[constants.EXPR].size
    assert len(seen_shapes) > 1, 'store must exercise >1 bucket'

    ref = TrainLoader(train.work_list, train.builder,
                      batch_size=4, seed=0, num_threads=1)
    frames_ref = sum(b[constants.EXPR].size for b in ref.epoch(0))
    assert frames_bucketed < frames_ref, 'bucketing must cut padded frames'

    # a short trial's real frames are identical to the unbucketed build
    item = min(train.work_list, key=lambda it: it[2])
    L = item[2]
    a = train.builder.build(item, pad_to=round_up(L, 8))
    b = train.builder.build(item)
    for k in a:
        np.testing.assert_array_equal(a[k][:L], b[k][:L])
        # pad-by-repeat: every padded frame equals the last real frame
        np.testing.assert_array_equal(
            a[k][L:], np.repeat(a[k][L - 1:L], a[k].shape[0] - L, axis=0))


def test_bucketed_training_epoch_runs(setup):
    args, exp, loaders = setup
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    loss = trainer.train_one_epoch(loaders[constants.TRAINSET], epoch=0)
    assert np.isfinite(loss)


def test_bucketed_epoch_under_data_parallel(setup):
    """Bucketed batches + DP: per-bucket tails are ragged (replicated
    path), divisible batches shard — one epoch runs and counts every
    batch."""
    import jax
    from types import SimpleNamespace

    args, exp, loaders = setup
    assert len(jax.devices()) == 8
    cfg = vars(args).copy()
    cfg.update(data_parallel=True, train_batch_size=8)
    dp_args = SimpleNamespace(**cfg)
    exp2 = Experiment(dp_args)
    exp2.prepare()
    dp_loaders = exp2.init_loaders()
    trainer = exp2.init_trainer()
    assert trainer.mesh is not None
    trainer.init_state(exp2._sample_batch(dp_loaders))
    train = dp_loaders[constants.TRAINSET]
    n_batches = len(train._plan(0))
    step_before = int(trainer.state.step)
    loss = trainer.train_one_epoch(train, epoch=0)
    assert np.isfinite(loss)
    # the TRAINER consumed every planned batch (state.step counts
    # steps; a skipped ragged bucket tail would show here)
    assert int(trainer.state.step) - step_before == n_batches


def test_len_counts_bucketed_remainder_batches():
    """len(TrainLoader) must equal the number of batches the plan
    actually yields: each bucket produces its own remainder batch, so
    ceil(N/batch_size) undercounts under --train_bucketed."""
    from types import SimpleNamespace
    from fvt_tpu.data.loader import TrainLoader

    builder = SimpleNamespace(window_length=300)
    # 3 buckets x 10 items at batch_size=16 -> 3 batches, not ceil(30/16)=2
    work = ([['p', 't', 40, None]] * 10 + [['p', 't', 140, None]] * 10
            + [['p', 't', 240, None]] * 10)
    loader = TrainLoader(work, builder, batch_size=16, seed=0,
                         bucket_quantum=100)
    plan = loader._plan(0)
    assert len(loader) == len(plan) == 3

    # unbucketed: plan and ceil agree
    loader = TrainLoader(work, builder, batch_size=16, seed=0)
    assert len(loader) == len(loader._plan(0)) == 2
