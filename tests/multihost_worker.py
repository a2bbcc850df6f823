"""REAL two-process multihost worker.

Invoked as a subprocess by
``test_multihost.py::test_real_two_process_losses_match_single_process``:
initializes ``jax.distributed`` over a loopback coordinator (CPU backend,
Gloo collectives, 2 virtual devices per process -> 4 global), then runs
two epochs of the actual multihost training path —
``TrainLoader.epoch_local`` per-host row slices +
``make_dp_train_step`` over the global mesh (trainer.py:132-174) — and
dumps the per-epoch losses as JSON.

Usage: multihost_worker.py <coordinator> <pid> <nproc> <store.json> <out.json>
"""
import json
import os
import sys


def main():
    coord, pid, nproc, store_json, out_path = sys.argv[1:6]
    pid, nproc = int(pid), int(nproc)

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root
    sys.path.insert(0, here)                   # tests/ (synth_store)

    import jax
    # config.update is the only reliable way to force CPU when the axon
    # TPU plugin is importable (CLAUDE.md); must run before first use
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid,
                               local_device_ids=[0, 1])
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    from types import SimpleNamespace
    from fvt_tpu import constants
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment

    with open(store_json) as f:
        store = json.load(f)

    outd = os.path.join(os.path.dirname(out_path), f'proc{pid}')
    os.makedirs(outd, exist_ok=True)
    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='vggish+bert+EXPR_continuous_label',
               window_length=8, hop_length=4, eval_bucket_quantum=8,
               train_batch_size=8, num_workers=1,
               calc_mean_std=True, seed=0, data_parallel=True,
               multihost_digest_check=True,  # desync guard exercised too
               outd=outd)
    args = SimpleNamespace(**cfg)
    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    assert trainer.mesh is not None
    assert len(trainer.mesh.devices.flat) == 2 * nproc
    trainer.init_state(exp._sample_batch(loaders))

    losses = [float(trainer.train_one_epoch(
        loaders[constants.TRAINSET], e)) for e in range(2)]
    with open(out_path, 'w') as f:
        json.dump({'process': pid, 'losses': losses}, f)


if __name__ == '__main__':
    main()
