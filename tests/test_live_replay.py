"""Live-pipeline lockstep harness (tools/live_replay.py).

Captures the reference CLI's actual training batches (dropout zeroed,
matched init) and replays them through the fvt train step: per-step
losses must agree at f32 tolerance.  This is the instrument that found
the round-5 silent-default-lr divergence (DESIGN.md §15) — step-0
parity with first-update divergence localizes optimizer wiring bugs
that fixed-batch lockstep legs (which bypass the live config path)
cannot see.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))


def test_live_replay_per_step_parity(tmp_path):
    import live_replay
    res = live_replay.main(workdir=str(tmp_path / 'replay'), epochs=1,
                           n_train=12, n_val=4, tol=5e-5)
    assert res['ok'], res
    assert res['n_steps'] >= 3
    # step 0 pins forward/data parity from the matched init; the rest
    # add the optimizer update chain
    assert res['step0_delta'] < 5e-6, res['step0_delta']
    # the replay exercised the reproduced silent-default-lr contract
    assert res['effective_lr'] == 0.001
