"""Pins for the reference-contract fixes from the models/train audit."""
import numpy as np
import pytest

from conftest import add_reference_to_path

add_reference_to_path()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fvt_tpu import constants  # noqa: E402
from fvt_tpu.train import optim  # noqa: E402


def test_sgd_dampening_matches_torch():
    """torch: buf = mu*buf + (1-dampening)*grad; was silently ignored."""
    from types import SimpleNamespace
    # honor_lr: step-MATH test vs a hand-built torch SGD with lr
    # passed explicitly (the live silent-default-lr contract is
    # pinned in test_optim.py)
    hp = SimpleNamespace(name_optimizer=constants.SGD, weight_decay=0.0,
                         momentum=0.9, dampening=0.5, nesterov=False,
                         lr=0.1, honor_lr=True)
    opt = optim.build_optimizer(hp)

    w0 = np.asarray([1.0, -2.0, 0.5], np.float32)
    g = np.asarray([0.3, -0.1, 0.2], np.float32)

    params = {'w': jnp.asarray(w0)}
    state = opt.init(params)
    for _ in range(3):
        updates, state = opt.update({'w': jnp.asarray(g)}, state, params)
        params = {'w': params['w'] + updates['w']}

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, dampening=0.5)
    for _ in range(3):
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    np.testing.assert_allclose(np.asarray(params['w']),
                               tw.detach().numpy(), rtol=1e-6)


def test_multistep_accepts_plus_separated_milestones():
    """The reference documents '+'-separated milestone strings."""
    from types import SimpleNamespace
    hp = SimpleNamespace(name_lr_scheduler=constants.MULTISTEP, lr=1.0,
                         honor_lr=True,  # milestone-parse test at a
                         # readable base lr; silent-default contract
                         # pinned in test_optim.py
                         milestone='10+20', gamma=0.1, step_size=40,
                         min_lr=1e-7, t_max=100, coef=0.5,
                         num_warmup_epoch=5, mode='min', factor=0.5,
                         patience=10, lr_scheduler=True)
    sched = optim.build_scheduler(hp, num_epochs=30, min_num_epochs=1)
    assert sched.lr(9) == 1.0
    assert np.isclose(sched.lr(10), 0.1)
    assert np.isclose(sched.lr(20), 0.01)


def test_fresh_run_trains_epoch0_at_scheduler_lr(tmp_path):
    """torch schedulers set the initial param-group lr at construction;
    a fresh MYWARMUP run must train epoch 0 at the ramped lr, not raw
    hp.lr."""
    from types import SimpleNamespace
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment
    from synth_store import make_meld_store

    store = make_meld_store(str(tmp_path / 's'), n_train=4, n_val=2,
                            n_test=2, min_len=4, max_len=8)
    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='vggish+bert+EXPR_continuous_label',
               window_length=8, hop_length=4, eval_bucket_quantum=8,
               train_batch_size=4, num_workers=1, calc_mean_std=True,
               num_epochs=2, min_num_epochs=5,  # warmup length ==
               # min_num_epochs, as the reference wires it
               # (instantiators.py:113)
               outd=str(tmp_path / 'out'), seed=0)
    cfg['opt__name_lr_scheduler'] = constants.MYWARMUP
    cfg['opt__lr'] = 1e-3
    import os
    os.makedirs(cfg['outd'], exist_ok=True)
    args = SimpleNamespace(**cfg)
    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))

    seen = []
    orig = trainer.train_one_epoch

    def spy(loader, epoch):
        seen.append(float(optim.get_lr(trainer.state.opt_state)))
        return orig(loader, epoch)

    trainer.train_one_epoch = spy
    trainer.optimize(loaders[constants.TRAINSET],
                     loaders[constants.VALIDSET],
                     loaders[constants.TESTSET])
    want_ep0 = trainer.scheduler.lr(0)
    assert want_ep0 < 1e-3  # the ramp actually starts below base lr
    # the WHOLE warmup ramp is applied to the live opt state, epoch by
    # epoch: lr(e) = base * (e+1) / warmup
    np.testing.assert_allclose(seen, [1e-3 * (e + 1) / 5
                                      for e in range(len(seen))],
                               rtol=1e-6)


def test_torch_batchnorm_running_var_is_unbiased():
    """torch BatchNorm1d normalizes with the biased batch variance but
    stores the UNBIASED (n/(n-1)) estimator in running_var."""
    from fvt_tpu.models.layers import TorchBatchNorm

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 6, 8)).astype(np.float32) * 2.0 + 1.0

    bn = TorchBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.key(0), jnp.asarray(x))
    out, mutated = bn.apply(variables, jnp.asarray(x),
                            mutable=['batch_stats'])

    ref = torch.nn.BatchNorm1d(8)
    ref.train()
    with torch.no_grad():
        t = torch.from_numpy(x.reshape(-1, 8)).T[None]  # (1, C, N)
        want = ref(t)[0].T.numpy().reshape(x.shape)

    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated['batch_stats']['bn']['mean']),
        ref.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated['batch_stats']['bn']['var']),
        ref.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_frozen_backbone_runs_in_train_mode_during_training():
    """model.train() in the reference puts the frozen backbone in train
    mode (trainer.py:318, no submodule .eval()): batch-stat BN whose
    running stats update during a train step."""
    import flax.linen as nn
    from fvt_tpu.models.models import LFAN

    class TinySpatial(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            x = x.reshape(x.shape[0], -1)[:, :16]
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, name='bn')(x)
            return nn.Dense(512, name='dense')(x)

    model = LFAN(modality=('video', 'vggish'), output_dim=7,
                 spatial_video=TinySpatial(),
                 tcn_dropout=0.0, fusion_dropout=0.0)
    rng = np.random.default_rng(1)
    batch = {
        'video': jnp.asarray(rng.normal(size=(2, 8, 4, 4, 3))
                             .astype(np.float32) + 3.0),
        'vggish': jnp.asarray(rng.normal(size=(2, 8, 128))
                              .astype(np.float32)),
    }
    variables = model.init(jax.random.key(0), batch, train=False)
    before = np.asarray(
        variables['batch_stats']['spatial_video']['bn']['mean']).copy()
    _, mutated = model.apply(
        variables, batch, train=True,
        rngs={'dropout': jax.random.key(1)}, mutable=['batch_stats'])
    after = np.asarray(
        mutated['batch_stats']['spatial_video']['bn']['mean'])
    assert np.abs(after - before).max() > 1e-3, \
        'spatial batch stats did not update in train mode'


def test_frozen_eval_backbones_optin_keeps_stats_fixed():
    """--frozen_eval_backbones (opt-in DIVERGENCE from the reference
    contract pinned above): frozen spatial encoders run eval-mode
    during training — running-stat BN, batch_stats unchanged — while
    the heads still run train-mode (their BN stats DO update)."""
    import flax.linen as nn
    from fvt_tpu.models.models import LFAN

    class TinySpatial(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            x = x.reshape(x.shape[0], -1)[:, :16]
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, name='bn')(x)
            return nn.Dense(512, name='dense')(x)

    model = LFAN(modality=('video', 'vggish'), output_dim=7,
                 spatial_video=TinySpatial(), frozen_eval=True,
                 tcn_dropout=0.0, fusion_dropout=0.0)
    rng = np.random.default_rng(1)
    batch = {
        'video': jnp.asarray(rng.normal(size=(2, 8, 4, 4, 3))
                             .astype(np.float32) + 3.0),
        'vggish': jnp.asarray(rng.normal(size=(2, 8, 128))
                              .astype(np.float32)),
    }
    variables = model.init(jax.random.key(0), batch, train=False)
    before = jax.tree.map(
        lambda v: np.asarray(v).copy(),
        variables['batch_stats']['spatial_video'])
    head_before = np.asarray(
        variables['batch_stats']['bn_video']['bn']['mean']).copy()
    _, mutated = model.apply(
        variables, batch, train=True,
        rngs={'dropout': jax.random.key(1)}, mutable=['batch_stats'])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        mutated['batch_stats']['spatial_video'], before)
    head_after = np.asarray(mutated['batch_stats']['bn_video']['bn']['mean'])
    assert np.abs(head_after - head_before).max() > 1e-4, \
        'head batch stats must still update in train mode'


def test_frozen_eval_backbones_flag_reaches_model():
    from types import SimpleNamespace
    from fvt_tpu import constants
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.models.registry import init_model
    cfg = get_config(constants.MELD)
    cfg.update(modality='video+vggish+bert+EXPR_continuous_label',
               frozen_eval_backbones=True)
    model = init_model(SimpleNamespace(**cfg))
    assert model.frozen_eval is True
    cfg['frozen_eval_backbones'] = False
    assert init_model(SimpleNamespace(**cfg)).frozen_eval is False
