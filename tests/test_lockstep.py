"""Deterministic lockstep training equivalence (tools/twin_train.py
``_lockstep_probe``): from a matched init with dropout zeroed, the
imported torch reference and fvt_tpu take the same optimizer steps on
the same batch cycle and the per-step train losses must agree.

This pins the optimizer/model INTERACTION over multiple steps (momentum
accumulation, weight decay, BN running-stat updates feeding later eval),
which single-step parity tests can't: /root/reference/trainer.py:399-430
+ the SGD construction.  Covered for ALL FOUR fusion families plus the
REGRESSION task (LFAN_REG: tanh head + CCCLoss, the reference's legacy
VA trainer loop, base/trainer.py:278):

  * the float64 legs are the exactness proof — with rounding removed,
    per-step losses agree at machine epsilon (measured 4e-16 LFAN,
    7e-16 CAN, 7e-13 JMT, 2e-14 MT), so the two stacks compute the
    SAME math and any float32 disagreement is rounding drift, not a
    model/optimizer bug (JMT's deep attention stack amplifies f32
    rounding chaotically: 5e-6 -> 2.2e-3 over 4 steps);
  * the float32 leg keeps the production dtype pinned at its measured
    drift envelope for the flagship (the full-size T=300/12-step probe
    measured 4.8e-6);
  * the JMT leg runs a raw video stream through a frozen stand-in
    backbone, pinning steps.split_frozen (no grads, no weight decay)
    against torch's requires_grad=False contract.
"""
import sys
from os.path import dirname, join

import pytest
import torch

sys.path.insert(0, join(dirname(dirname(__file__)), 'tools'))

from conftest import add_reference_to_path  # noqa: E402


def _save_init(model_name, T, tmp_path):
    from twin_train import _make_lockstep_ref
    torch.manual_seed(0)
    ref = _make_lockstep_ref(model_name, T)
    if model_name in ('LFAN', 'LFAN_REG'):
        ref.init()
    init_pt = str(tmp_path / 'init.pt')
    torch.save(ref.state_dict(), init_pt)
    return init_pt


# LFAN_REG = the REGRESSION task: tanh head (model.py:485+523) trained
# under CCCLoss (base/loss_function.py:6-24, base/trainer.py:278) — the
# one task family the classification legs can't cover (different loss
# surface, different gradient path through the bounded head).
@pytest.mark.parametrize('model_name', ['LFAN', 'CAN', 'JMT', 'MT',
                                        'LFAN_REG'])
def test_lockstep_exact_in_float64(tmp_path, model_name):
    add_reference_to_path()
    from twin_train import _lockstep_probe

    T = 40
    init_pt = _save_init(model_name, T, tmp_path)
    res = _lockstep_probe(init_pt, model_name=model_name,
                          n_steps=4, n_batches=2, B=2, T=T, x64=True)
    assert res['max_step_loss_delta'] < 1e-9, res
    assert res['final_eval_loss_delta'] < 1e-9, res


def test_lockstep_float32_drift_bounded(tmp_path):
    add_reference_to_path()
    from twin_train import _lockstep_probe

    T = 40
    init_pt = _save_init('LFAN', T, tmp_path)
    res = _lockstep_probe(init_pt, model_name='LFAN',
                          n_steps=4, n_batches=2, B=2, T=T)
    assert res['max_step_loss_delta'] < 1e-4, res
    assert res['final_eval_loss_delta'] < 1e-4, res


def test_lockstep_frozen_backbone_stays_frozen(tmp_path):
    """The stand-in spatial backbone must be bit-identical after the
    lockstep steps on BOTH sides (torch: requires_grad=False, matching
    model.py:1115-1117; fvt: steps.split_frozen excludes 'spatial*'
    from grads and the optimizer, so weight decay can't drift it)."""
    add_reference_to_path()
    from twin_train import _lockstep_probe, _make_lockstep_ref

    T = 24
    torch.manual_seed(1)
    ref = _make_lockstep_ref('JMT', T)
    init_pt = str(tmp_path / 'init.pt')
    torch.save(ref.state_dict(), init_pt)

    res = _lockstep_probe(init_pt, model_name='JMT',
                          n_steps=2, n_batches=1, B=2, T=T)
    assert res['frozen_drift_torch'] == 0.0, res
    assert res['frozen_drift_fvt'] == 0.0, res
