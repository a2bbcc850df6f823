"""Per-host sharded data loading (parallel/multihost.py).

No multi-process runtime exists in CI, so the contract is pinned two
ways: (a) simulated processes — each host's epoch_local slices, built
independently, concatenate to exactly the single-host epoch batches
(including full-batch replication of ragged batches); (b) with one
process, the make_array assembly path feeds the DP train step with
numerics identical to the shard_batch path on the 8-device CPU mesh.
"""
import numpy as np
import pytest

from types import SimpleNamespace

import jax

from fvt_tpu import constants
from fvt_tpu.config.defaults import get_config
from fvt_tpu.data.loader import TrainLoader
from fvt_tpu.experiment import Experiment
from fvt_tpu.parallel import multihost as mh
from synth_store import make_meld_store


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('mhstore'))
    store = make_meld_store(root, n_train=19, n_val=3, n_test=3,
                            min_len=4, max_len=8)
    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='vggish+bert+EXPR_continuous_label',
               window_length=8, hop_length=4,
               train_batch_size=8, num_workers=1,
               calc_mean_std=True, seed=0, data_parallel=True)
    args = SimpleNamespace(**cfg)
    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    return args, exp, loaders


def test_host_slice_rules():
    assert mh.host_slice(8, 0, 2) == (0, 4)
    assert mh.host_slice(8, 1, 2) == (4, 8)
    assert mh.host_slice(8, 0, 1) == (0, 8)
    assert mh.host_slice(7, 1, 2) is None  # indivisible -> replicate


def test_simulated_two_process_slices_concat_to_global(setup):
    args, exp, loaders = setup
    train = loaders[constants.TRAINSET]

    global_batches = list(train.epoch(3))
    locals_per_proc = [
        list(train.epoch_local(3, divisor=2, process_index=p,
                               process_count=2))
        for p in (0, 1)]

    assert len(global_batches) == len(locals_per_proc[0])
    # the fixture must exercise BOTH branches: even batches (sliced) and
    # a ragged tail (built in full on every host)
    sizes = [g[constants.EXPR].shape[0] for g in global_batches]
    assert any(r % 2 == 0 for r in sizes) and any(r % 2 for r in sizes)
    for j, g in enumerate(global_batches):
        rows = g[constants.EXPR].shape[0]
        (b0, r0), (b1, r1) = locals_per_proc[0][j], locals_per_proc[1][j]
        assert r0 == r1 == rows
        for k in g:
            if rows % 2 == 0:  # divisor=2 in this simulation
                np.testing.assert_array_equal(
                    np.concatenate([b0[k], b1[k]], axis=0), g[k])
            else:  # ragged: every host builds the full batch
                np.testing.assert_array_equal(b0[k], g[k])
                np.testing.assert_array_equal(b1[k], g[k])


def test_single_process_global_batch_matches_shard_batch(setup):
    args, exp, loaders = setup
    from fvt_tpu.parallel.mesh import make_mesh, shard_batch
    assert len(jax.devices()) >= 8

    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    assert trainer.mesh is not None

    train = loaders[constants.TRAINSET]
    batch, rows = next(iter(train.epoch_local(0, divisor=8)))
    if rows % 8:
        pytest.skip('first batch ragged in this store draw')

    a = mh.global_batch(trainer.mesh, batch)
    b = shard_batch(batch, trainer.mesh)
    rng = jax.random.key(0)
    # the DP step donates the state; rebuild it between calls (init is
    # deterministic in the seed)
    _, loss_a = trainer.train_step(trainer.state, a, rng)
    trainer.init_state(exp._sample_batch(loaders))
    _, loss_b = trainer.train_step(trainer.state, b, rng)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
