#!/usr/bin/env python
"""Live-pipeline lockstep: replay the reference's OWN training batches
through the fvt train step and compare per-step losses.

The twin_train lockstep legs feed both stacks the same FIXED synthetic
batch cycle — strong, but they bypass everything upstream of the step
(windowing, pad-by-repeat, normalization, batch assembly, optimizer
instantiation from the live config).  This harness closes that gap:

  1. stage a runnable reference copy whose model records every
     train-mode batch (inputs + labels + the loss torch computed) to
     disk, with dropout zeroed (TWIN_ZERO_DROPOUT),
  2. run the real reference CLI for N epochs on a synthetic store from
     a saved matched init,
  3. replay the captured batch sequence, in order, through the fvt
     train step built from the SAME live config (the silent-default-lr
     contract included, train/optim.py::effective_base_lr), starting
     from the ported init,
  4. compare per-step losses.

This is the instrument that localized the round-5 silent-lr find
(DESIGN.md §15): step-0 parity at 1e-6 with divergence from the first
UPDATE means optimizer wiring; divergence at step 0 means forward/data;
no divergence means the stacks train identically on real pipelines.
Measured result with the fix: max per-step delta 3e-6 (f32) over 36
steps of the reference's live C-EXPR-DB batches.

Usage:
  python tools/live_replay.py [--workdir /tmp/fvt_replay] [--epochs 2]
      [--n_train 24] [--tol 5e-5] [--out REPLAY.json]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
from os.path import join

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, join(REPO, 'tools'))
sys.path.insert(0, join(REPO, 'tests'))

import reference_interop as RI  # noqa: E402
import twin_train as TT         # noqa: E402

# Appended to the staged launcher: record every train-mode batch the
# model actually consumes (inputs at the forward, labels + loss at the
# criterion — the reference pops labels before forward) and zero all
# dropout so the replay is deterministic.
CAPTURE_PATCH = '''
import os as _os
import numpy as _np
import torch as _t
import experiment as _exp_mod
_B = {'i': 0}
_orig_init_model_cap = _exp_mod.Experiment.init_model
def _cap_init_model(self):
    _m = _orig_init_model_cap(self)
    for _mod in _m.modules():
        if isinstance(_mod, _t.nn.Dropout):
            _mod.p = 0.0
    _orig_fwd = _m.forward
    def _fwd(X):
        if _m.training:
            _B['cur'] = {k: v.detach().cpu().numpy().copy()
                         for k, v in X.items()}
        return _orig_fwd(X)
    _m.forward = _fwd
    return _m
_exp_mod.Experiment.init_model = _cap_init_model
_ce = _t.nn.CrossEntropyLoss.forward
def _ce_cap(self, inp, tgt):
    out = _ce(self, inp, tgt)
    if 'cur' in _B and inp.requires_grad \
            and _B['i'] < int(_os.environ.get('REPLAY_MAX_STEPS', '200')):
        d = dict(_B.pop('cur'))
        d['labels'] = tgt.detach().cpu().numpy().copy()
        d['loss'] = _np.float64(out.detach().cpu().numpy())
        _np.savez(_os.path.join(_os.environ['REPLAY_BATCH_DIR'],
                                f"b{_B['i']:03d}.npz"), **d)
        _B['i'] += 1
    return out
_t.nn.CrossEntropyLoss.forward = _ce_cap
'''


def capture_reference(workdir, data, epochs, seed=0, lr=0.01,
                      batch=4) -> tuple:
    """Run the patched reference; returns (batch_files, init_pt)."""
    refrun = TT._stage_refrun(workdir, 'refrun_replay', data,
                              ds='C-EXPR-DB')
    anchor = "sys.argv = ['main.py']"
    lp = join(refrun, '_run_cpu.py')
    src = open(lp).read()
    assert anchor in src
    open(lp, 'w').write(src.replace(anchor,
                                    CAPTURE_PATCH + '\n' + anchor))
    bdir = join(workdir, 'batches')
    os.makedirs(bdir, exist_ok=True)
    init_pt = join(workdir, 'replay_init.pt')
    save = dict(os.environ)
    os.environ['REPLAY_BATCH_DIR'] = bdir
    try:
        TT._run_reference(refrun, join(workdir, 'stubs'), data, epochs,
                          lr, batch, save_init=init_pt, ds='C-EXPR-DB',
                          seed=seed,
                          extra_args=('--use_other_class', 'true'))
    finally:
        os.environ.clear()
        os.environ.update(save)
    files = sorted(glob.glob(join(bdir, 'b*.npz')))
    assert files, 'reference recorded no train batches'
    return files, init_pt


def replay_fvt(files, init_pt, lr=0.01):
    """fvt per-step losses over the captured sequence (dropout-0 model,
    live-config optimizer — including the reproduced silent-default
    lr)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import torch
    from fvt_tpu import constants
    from fvt_tpu.config import model_config as MC
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.models import torch_port as port
    from fvt_tpu.models.models import LFAN
    from fvt_tpu.train import optim as O
    from fvt_tpu.train.steps import (create_train_state, make_train_step,
                                     split_frozen)

    sd = torch.load(init_pt, map_location='cpu')
    params, stats = port.lfan_from_torch(sd, ['vggish', 'bert'],
                                         MC.TCN_CHANNELS,
                                         MC.EMBEDDING_DIM)
    model = LFAN(modality=('vggish', 'bert'), output_dim=8,
                 tcn_dropout=0.0, fusion_dropout=0.0)
    hp = O.standardize_opt_params({**get_config('C-EXPR-DB'),
                                   'opt__lr': lr,
                                   'use_other_class': True})
    optimizer = O.build_optimizer(hp)

    def to_batch(z):
        b = z['vggish'].shape[0]
        return {'vggish': jnp.asarray(z['vggish'][:, 0]),
                'bert': jnp.asarray(z['bert'][:, 0]),
                constants.EXPR: jnp.asarray(
                    z['labels'].reshape(b, -1).astype(np.int32))}

    state = create_train_state(model, optimizer,
                               to_batch(np.load(files[0])),
                               jax.random.key(0))
    state = state.replace(params=jax.tree.map(jnp.asarray, params),
                          batch_stats=jax.tree.map(jnp.asarray, stats))
    state = state.replace(
        opt_state=optimizer.init(split_frozen(state.params)[0]))
    step = make_train_step(model, optimizer)
    losses = []
    for f in files:
        state, loss = step(state, to_batch(np.load(f)),
                           jax.random.key(7))
        losses.append(float(loss))
    return losses, float(O.effective_base_lr(hp))


def main(workdir='/tmp/fvt_replay', epochs=2, n_train=24, n_val=8,
         tol=5e-5, seed=0, out_json=None) -> dict:
    if os.path.isdir(workdir):
        shutil.rmtree(workdir)
    data = join(workdir, 'data')
    for name, src in RI.STUBS.items():
        path = join(workdir, 'stubs', name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'w') as f:
            f.write(src)
    from synth_store import make_cexpr_store
    make_cexpr_store(join(data, 'abaw7', 'C-EXPR-DB'), n_train=n_train,
                     n_val=n_val, min_len=8, max_len=30, seed=200,
                     separation=0.8, label_noise=0.25, ambiguity=0.25)

    files, init_pt = capture_reference(workdir, data, epochs, seed=seed)
    ref_losses = [float(np.load(f)['loss']) for f in files]
    fvt_losses, eff_lr = replay_fvt(files, init_pt)
    deltas = [abs(a - b) for a, b in zip(ref_losses, fvt_losses)]
    result = {
        'n_steps': len(files),
        'epochs': epochs,
        'effective_lr': eff_lr,
        'ref_losses': [round(x, 9) for x in ref_losses],
        'fvt_losses': [round(x, 9) for x in fvt_losses],
        'max_step_loss_delta': max(deltas),
        'step0_delta': deltas[0],
        'tol': tol,
        'ok': bool(max(deltas) <= tol),
        'note': 'reference live CLI batches (dropout zeroed) replayed '
                'in order through the fvt train step from the ported '
                'matched init; step-0 delta isolates forward/data '
                'parity, later steps add the optimizer update chain',
    }
    print(json.dumps({k: result[k] for k in
                      ('n_steps', 'effective_lr', 'step0_delta',
                       'max_step_loss_delta', 'tol', 'ok')}, indent=2))
    if out_json:
        with open(out_json, 'w') as f:
            json.dump(result, f, indent=2)
        print(f'wrote {out_json}')
    return result


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default='/tmp/fvt_replay')
    p.add_argument('--epochs', type=int, default=2)
    p.add_argument('--n_train', type=int, default=24)
    p.add_argument('--tol', type=float, default=5e-5)
    p.add_argument('--out', default=None)
    a = p.parse_args()
    res = main(a.workdir, a.epochs, a.n_train, tol=a.tol,
               out_json=a.out)
    sys.exit(0 if res['ok'] else 1)
