"""Deterministic lockstep training equivalence (tools/twin_train.py
``_lockstep_probe``): from a matched init with dropout zeroed, the
imported torch reference and fvt_tpu take the same optimizer steps on
the same batch cycle — per-step train losses and the final held-out
eval loss must agree at fp32-drift tolerance.

This pins the optimizer/model INTERACTION over multiple steps (momentum
accumulation, weight decay, BN running-stat updates feeding later eval),
which single-step parity tests can't: /root/reference/trainer.py:399-430
+ the SGD construction.  The full-size probe (T=300, 12 steps) measured
max per-step loss delta 4.8e-6 (r4); this small-shape version keeps the
contract in the suite.
"""
import sys
from os.path import dirname, join

import torch

sys.path.insert(0, join(dirname(dirname(__file__)), 'tools'))

from conftest import add_reference_to_path  # noqa: E402


def test_lockstep_losses_match(tmp_path):
    add_reference_to_path()
    from models.model import LFAN as RefLFAN
    from fvt_tpu import constants
    from fvt_tpu.config import model_config as MC
    from twin_train import _lockstep_probe

    T = 40
    torch.manual_seed(0)
    ref = RefLFAN(backbone_settings=MC.BACKBONE_SETTINGS, output_dim=7,
                  task=constants.CLASSIFICATION,
                  modality=['vggish', 'bert'], example_length=T,
                  kernel_size=5, tcn_channel=MC.TCN_CHANNELS,
                  modal_dim=32, num_heads=2, root_dir='', device='cpu')
    ref.init()
    init_pt = str(tmp_path / 'init.pt')
    torch.save(ref.state_dict(), init_pt)

    res = _lockstep_probe(init_pt, n_steps=4, n_batches=2, B=2, T=T)
    assert res['max_step_loss_delta'] < 1e-4, res
    assert res['final_eval_loss_delta'] < 1e-4, res
