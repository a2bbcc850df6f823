"""Optimizer/scheduler parity vs torch (the reference's optim stack)."""
import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fvt_tpu import constants
from fvt_tpu.train import optim as O


class HP:
    pass


def _hp(**kw):
    hp = HP()
    defaults = dict(name_optimizer=constants.SGD, lr=0.01, momentum=0.9,
                    dampening=0.0, nesterov=True, weight_decay=1e-4,
                    beta1=0.9, beta2=0.999, eps_adam=1e-8, amsgrad=False,
                    lr_scheduler=True, name_lr_scheduler=constants.MYSTEP,
                    gamma=0.1, step_size=3, last_epoch=-1, min_lr=1e-7,
                    t_max=10, mode=constants.MIN_MODE, factor=0.5,
                    patience=2, milestone='2,5')
    defaults.update(kw)
    for k, v in defaults.items():
        setattr(hp, k, v)
    return hp


def _torch_lr_sequence(sched, optimizer, n):
    out = []
    for _ in range(n):
        out.append(optimizer.param_groups[0]['lr'])
        optimizer.step()
        sched.step()
    return out


@pytest.mark.parametrize('name', ['STEP', 'MULTISTEP', 'COSINE'])
def test_schedule_matches_torch(name):
    base_lr = 0.01
    p = [torch.nn.Parameter(torch.zeros(1))]
    opt = torch.optim.SGD(p, lr=base_lr)
    if name == 'STEP':
        ref = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.1)
        mine = O.StepSchedule(base_lr, 3, 0.1)
    elif name == 'MULTISTEP':
        ref = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[2, 5],
                                                   gamma=0.1)
        mine = O.MultiStepSchedule(base_lr, [2, 5], 0.1)
    else:
        ref = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10,
                                                         eta_min=1e-5)
        mine = O.CosineSchedule(base_lr, 10, 1e-5)

    want = _torch_lr_sequence(ref, opt, 12)
    got = [mine.lr(e) for e in range(12)]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mystep_and_mycosine_clamping():
    s = O.MyStepSchedule(0.01, step_size=2, gamma=0.1, min_lr=1e-4)
    lrs = [s.lr(e) for e in range(10)]
    assert lrs[0] == 0.01 and lrs[2] == pytest.approx(1e-3)
    assert min(lrs) == 1e-4  # clamped

    c = O.MyCosineSchedule(0.01, coef=0.5, max_epochs=10, min_lr=1e-9)
    # reference formula: base*coef*(1+cos((e-1)pi/max))
    assert c.lr(1) == pytest.approx(0.01 * 0.5 * 2)
    assert c.lr(11) >= 1e-9


def test_mywarmup_epoch_ramp():
    """lr ramps linearly to base over the warmup epochs (epoch-granular
    version of the reference's per-batch warmup_lr ramp)."""
    s = O.MyWarmupSchedule(0.01, num_warmup_epoch=4)
    assert s.lr(0) == pytest.approx(0.01 * 1 / 4)
    assert s.lr(1) == pytest.approx(0.01 * 2 / 4)
    assert s.lr(2) == pytest.approx(0.01 * 3 / 4)
    assert s.lr(3) == pytest.approx(0.01)   # relative_epoch == warmup
    assert s.lr(10) == pytest.approx(0.01)  # steady after warmup


def test_mywarmup_plateau_decay():
    s = O.MyWarmupSchedule(0.01, min_lr=1e-7, mode='min', patience=2,
                           factor=0.5, num_warmup_epoch=3)
    lr0 = s.lr(0)
    # bad metrics after warmup trigger a halving after patience+1 epochs
    for e in range(10):
        s.step(e, metric=1.0 if e == 0 else 2.0)
    assert s.lr(10) < lr0


@pytest.mark.parametrize('name', [constants.SGD, constants.ADAM])
def test_optimizer_single_step_matches_torch(name):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(6, 4)).astype(np.float32)
    g = rng.normal(size=(6, 4)).astype(np.float32)

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if name == constants.SGD:
        topt = torch.optim.SGD([tp], lr=0.01, momentum=0.9, dampening=0.0,
                               weight_decay=1e-4, nesterov=True)
    else:
        topt = torch.optim.Adam([tp], lr=0.01, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=1e-4)
    for _ in range(3):
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
    want = tp.detach().numpy()

    # honor_lr: this test compares step MATH against a hand-built torch
    # optimizer with lr passed explicitly; the live reference drops lr
    # (see test_live_optimizer_lr_reproduces_reference_default)
    hp = _hp(name_optimizer=name, honor_lr=True)
    opt = O.build_optimizer(hp)
    params = {'w': jnp.asarray(w0)}
    state = opt.init(params)
    for _ in range(3):
        updates, state = opt.update({'w': jnp.asarray(g)}, state, params)
        import optax
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params['w']), want, rtol=1e-5,
                               atol=1e-6)


def test_live_optimizer_lr_reproduces_reference_default():
    """The reference builds torch SGD/Adam WITHOUT passing lr
    (instantiators.py:74-92: the `_params` group list with the config
    lr is built and never used), so its live runs train at torch's
    default 1e-3 regardless of opt__lr.  Pin (a) that fact on the
    IMPORTED reference, (b) that the fvt live path reproduces it, and
    (c) that opt__honor_lr=True restores configured-lr semantics.
    Found by the round-5 non-saturated accuracy twins (fvt at honored
    lr=0.01 converged ~2x faster than the reference on identical batch
    sequences)."""
    from conftest import add_reference_to_path
    add_reference_to_path()
    import os
    import dllogger as DLLogger
    if type(DLLogger.GLOBAL_LOGGER).__name__ == 'NotInitializedObject':
        DLLogger.init_arb(backends=[], master_pid=os.getpid())  # it logs
    import instantiators as ref_inst
    from fvt_tpu.config.defaults import get_config

    cfg = {**get_config('MELD'), 'opt__lr': 0.05}
    p = [torch.nn.Parameter(torch.zeros(1))]
    ref_opt, ref_sched = ref_inst.get_optimizer_scheduler(
        dict(cfg), p, epoch=0, best=None)
    assert ref_opt.param_groups[0]['lr'] == pytest.approx(1e-3)
    # the torch scheduler snapshots that default as its base lr too
    assert ref_sched.base_lrs == [pytest.approx(1e-3)]

    hp = O.standardize_opt_params(dict(cfg))
    assert O.effective_base_lr(hp) == pytest.approx(1e-3)
    assert O.get_lr(O.build_optimizer(hp).init({'w': jnp.zeros(1)})) \
        == pytest.approx(1e-3)
    sched = O.build_scheduler(hp, num_epochs=10, min_num_epochs=5)
    assert sched.lr(0) == pytest.approx(ref_sched.get_lr()[0])

    hp2 = O.standardize_opt_params({**cfg, 'opt__honor_lr': True})
    assert O.effective_base_lr(hp2) == pytest.approx(0.05)
    sched2 = O.build_scheduler(hp2, num_epochs=10, min_num_epochs=5)
    assert sched2.lr(0) == pytest.approx(0.05)


def test_mywarmup_keeps_configured_lr():
    """MYWARMUP is the one schedule where the configured lr matters in
    the reference: base/scheduler.py:95 stores it and :148-151 jumps
    the param groups to it after warmup — so build_scheduler must keep
    hp.lr there even while every snapshot-based schedule runs off the
    torch-default base."""
    hp = O.standardize_opt_params({
        **{f'opt__{k}': v for k, v in vars(_hp()).items()},
        'opt__lr': 0.02, 'opt__name_lr_scheduler': constants.MYWARMUP,
        'opt__mode': constants.MAX_MODE})
    s = O.build_scheduler(hp, num_epochs=10, min_num_epochs=4)
    assert s.lr(3) == pytest.approx(0.02)   # post-warmup = config lr
    assert s.lr(0) == pytest.approx(0.02 / 4)


def test_mywarmup_wired_in_trainer(tmp_path):
    """CLI smoke: a MYWARMUP-configured run completes end-to-end (the
    lr WIRING itself — ramp values applied to the live opt state each
    epoch — is asserted in
    test_reference_contract_fixes.test_fresh_run_trains_epoch0_at_scheduler_lr;
    plateau-decay math in the unit tests above)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_store import make_meld_store
    from fvt_tpu.main import main

    store = make_meld_store(str(tmp_path / 'store'), n_train=4, n_val=2,
                            n_test=2, min_len=6, max_len=12,
                            separation=0.0)  # unlearnable -> plateau
    outd = str(tmp_path / 'exp')
    main([
        '--dataset_name', 'MELD',
        '--dataset_path', store['dataset_path'],
        '--folds_dir', store['folds_dir'],
        '--modality', 'vggish+bert+EXPR_continuous_label',
        '--model_name', 'LFAN',
        '--num_epochs', '6',
        '--min_num_epochs', '1',
        '--train_batch_size', '4',
        '--num_workers', '1',
        '--window_length', '8',
        '--hop_length', '6',
        '--eval_bucket_quantum', '8',
        '--outd', outd,
        '--opt__name_lr_scheduler', 'MYWARMUP',
        '--opt__mode', 'MAX',
        '--opt__patience', '1',
        '--opt__factor', '0.5',
        '--opt__lr', '1e-3',
    ])
    assert os.path.isfile(os.path.join(outd, 'passed.txt'))


def test_standardize_opt_params_mode_collision_is_deterministic():
    """'opt__mode' (min/max) must win over the run-mode key 'mode'
    regardless of dict insertion order (relying on order silently
    flipped MYWARMUP's plateau direction if defaults were reordered)."""
    from fvt_tpu.train.optim import standardize_opt_params

    hp = standardize_opt_params(
        {'mode': 'TRAINING', 'opt__mode': 'min', 'opt__lr': 0.1})
    assert hp.mode == 'min' and hp.lr == 0.1
    # reversed insertion order: same result
    hp = standardize_opt_params(
        {'opt__mode': 'min', 'opt__lr': 0.1, 'mode': 'TRAINING'})
    assert hp.mode == 'min'
