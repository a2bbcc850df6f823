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

    hp = _hp(name_optimizer=name)
    opt = O.build_optimizer(hp)
    params = {'w': jnp.asarray(w0)}
    state = opt.init(params)
    for _ in range(3):
        updates, state = opt.update({'w': jnp.asarray(g)}, state, params)
        import optax
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params['w']), want, rtol=1e-5,
                               atol=1e-6)


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
