"""Accuracy-equivalence twins at a NON-saturated operating point.

The round-4 twin evidence (tools/twin_train.py) compared final W-F1s on
a separable store where BOTH frameworks score exactly 1.0 on every
selection cell — a 0.0 delta at a saturated ceiling cannot distinguish
"equivalent" from "both trivially perfect".  This harness runs
matched-init twins (the imported torch reference vs fvt_tpu, same
store, same schedule) on stores built to converge WELL BELOW the
ceiling (class-midpoint feature manifolds + wrong-label noise,
tests/synth_store.py), across >=3 seeds, for BOTH selection-metric
families the reference defines:

  * MELD-style: video-level W-F1 under each of the three frame->video
    aggregation rules (/root/reference/trainer.py:662-668),
  * C-EXPR-DB-style: frame-level W-F1 per ignore-class slice
    (None and 7='Other', /root/reference/trainer.py:648-654,
    --use_other_class true).

Per (dataset, seed, cell): both masters + the delta; per cell: the
across-seed mean/std of the deltas AND of each side's scores, so the
verdict carries seed spread instead of a single coin flip.  Checks:

  * no reference cell saturates (<= saturation_cap, default 0.98) and
    none degenerates (>= floor, default 0.15): the metric had dynamic
    range at the operating point,
  * every |delta| <= wf1_tol (default 0.10 — two videos of a ~30-video
    split at video level; stated in the output),
  * the MEAN delta per cell <= mean_tol (default 0.06): systematic
    gaps must be smaller than single-seed noise.

Usage:
  python tools/twin_accuracy.py [--workdir /tmp/fvt_twin_acc]
      [--seeds 0,1,2] [--epochs 8] [--out INTEROP_ACC.json]

Writes the verdict JSON; exits nonzero if any check fails.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
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

MELD_CELLS = ('FRAMES_VOTE', 'FRAMES_AVG_PROBS', 'FRAMES_AVG_LOGITS')
CEXPR_CELLS = ('None', '7')

# Store hardness (calibrated on this image, see DESIGN.md): midpoint
# manifolds make ~1/4 of videos genuinely boundary-dependent and wrong
# recorded labels cap the reachable W-F1 near 1 - label_noise.
HARD = dict(separation=0.8, label_noise=0.25, ambiguity=0.25)


def _test_wf1_cexpr(outd: str) -> dict:
    """C-EXPR-DB masters: frame-level W-F1 per ignore-class slice from
    test-{None,7}-perf.pkl (identical artifact contract both stacks)."""
    out = {}
    for cell in CEXPR_CELLS:
        with open(join(outd, f'test-{cell}-perf.pkl'), 'rb') as f:
            perf = pickle.load(f)
        ign = None if cell == 'None' else int(cell)
        p = perf[ign]
        out[cell] = {
            'W_F1': float(p['W_F1']['FRAME_LEVEL']['master']),
            'MACRO_F1': float(p['MACRO_F1']['FRAME_LEVEL']['master']),
            'CL_ACC': float(p['CL_ACC']['FRAME_LEVEL']['master']),
        }
    return out


def _one_twin(workdir, data, ds, seed, epochs, lr, batch):
    """One matched-init twin (reference then fvt) on dataset ``ds`` with
    ``seed``; returns (ref_cells, fvt_cells) master dicts."""
    tag = f'{ds.replace("-", "")}_s{seed}'
    refrun = TT._stage_refrun(workdir, f'refrun_{tag}', data, ds=ds)
    init_pt = join(workdir, f'init_{tag}.pt')
    extra = ('--use_other_class', 'true') if ds == 'C-EXPR-DB' else ()
    ref_exp = TT._run_reference(refrun, join(workdir, 'stubs'), data,
                                epochs, lr, batch, save_init=init_pt,
                                ds=ds, seed=seed, extra_args=extra)
    extra_cfg = {'use_other_class': True} if ds == 'C-EXPR-DB' else {}
    fvt_outd, _, _ = TT._train_fvt(
        workdir, data, epochs, lr, batch, init_pt=init_pt, ds=ds,
        seed=seed, outd_name=f'fvt_out_{tag}', extra_cfg=extra_cfg)
    if ds == 'C-EXPR-DB':
        return _test_wf1_cexpr(ref_exp), _test_wf1_cexpr(fvt_outd)
    return TT._test_wf1(ref_exp), TT._test_wf1(fvt_outd)


def _summarize(per_seed, legs):
    """Per-cell across-seed statistics.  ``delta_vs_seed_noise``
    contextualizes the cross-stack gap: mean |ref-fvt| divided by the
    noise scale sqrt(ref_std^2 + fvt_std^2) of the two stacks' own
    seed-to-seed spreads — a ratio ~<=1 means the stacks are
    indistinguishable at the seed-noise level of this store/metric, so
    a delta near the absolute tolerance is eval noise, not a
    systematic gap (the systematic-gap instruments are the lockstep
    and live-replay legs)."""
    summary = {}
    for ds, cells in legs.items():
        rows = per_seed[ds]
        summary[ds] = {}
        for c in cells:
            refs = [r['reference'][c]['W_F1'] for r in rows]
            fvts = [r['fvt_tpu'][c]['W_F1'] for r in rows]
            ds_ = [r['deltas_W_F1'][c] for r in rows]
            noise = float(np.sqrt(np.std(refs) ** 2 + np.std(fvts) ** 2))
            summary[ds][c] = {
                'ref_mean': float(np.mean(refs)),
                'ref_std': float(np.std(refs)),
                'ref_per_seed': refs,
                'fvt_mean': float(np.mean(fvts)),
                'fvt_std': float(np.std(fvts)),
                'fvt_per_seed': fvts,
                'delta_mean': float(np.mean(ds_)),
                'delta_max': float(np.max(ds_)),
                'seed_noise_scale': noise,
                'delta_vs_seed_noise': (float(np.mean(ds_) / noise)
                                        if noise > 0 else None),
            }
    return summary


def resummarize(json_path: str) -> dict:
    """Recompute summary/checks of an existing verdict from its saved
    per-seed rows (no retraining) — for adding derived statistics."""
    import json as _json
    with open(json_path) as f:
        d = _json.load(f)
    legs = {'MELD': MELD_CELLS, 'C-EXPR-DB': CEXPR_CELLS}
    d['summary'] = _summarize(d['per_seed'], legs)
    with open(json_path, 'w') as f:
        _json.dump(d, f, indent=2)
    return d


def main(workdir='/tmp/fvt_twin_acc', seeds=(0, 1, 2), epochs=8,
         lr=0.01, batch=4, wf1_tol=0.10, mean_tol=0.06,
         saturation_cap=0.98, floor=0.15, out_json=None) -> dict:
    if os.path.isdir(workdir):
        shutil.rmtree(workdir)
    data = join(workdir, 'data')
    stubs = join(workdir, 'stubs')
    for name, src in RI.STUBS.items():
        path = join(stubs, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'w') as f:
            f.write(src)

    from synth_store import make_meld_store, make_cexpr_store
    # one FIXED store per dataset family (seed 100/200 decoupled from
    # the training seeds): the operating point is a property of the
    # data; seeds vary init/shuffle/dropout only
    make_meld_store(join(data, 'abaw7', 'MELD'), n_train=96, n_val=32,
                    n_test=40, min_len=8, max_len=40, seed=100, **HARD)
    make_cexpr_store(join(data, 'abaw7', 'C-EXPR-DB'), n_train=72,
                     n_val=28, min_len=8, max_len=40, seed=200, **HARD)

    legs = {'MELD': MELD_CELLS, 'C-EXPR-DB': CEXPR_CELLS}
    per_seed = {ds: [] for ds in legs}
    for ds, cells in legs.items():
        for seed in seeds:
            print(f'== twin_accuracy: {ds} seed {seed} '
                  f'({epochs} epochs each stack) ==', flush=True)
            ref, fvt = _one_twin(workdir, data, ds, seed, epochs, lr,
                                 batch)
            per_seed[ds].append({
                'seed': seed,
                'reference': ref, 'fvt_tpu': fvt,
                'deltas_W_F1': {c: abs(ref[c]['W_F1'] - fvt[c]['W_F1'])
                                for c in cells},
            })

    summary = _summarize(per_seed, legs)

    all_ref = [r['reference'][c]['W_F1']
               for ds, cells in legs.items() for r in per_seed[ds]
               for c in cells]
    all_deltas = [r['deltas_W_F1'][c]
                  for ds, cells in legs.items() for r in per_seed[ds]
                  for c in cells]
    mean_deltas = [summary[ds][c]['delta_mean']
                   for ds, cells in legs.items() for c in cells]
    checks = {
        'no_saturated_reference_cell':
            bool(max(all_ref) <= saturation_cap),
        'no_degenerate_reference_cell': bool(min(all_ref) >= floor),
        'all_deltas_within_tol': bool(max(all_deltas) <= wf1_tol),
        'mean_delta_within_tol': bool(max(mean_deltas) <= mean_tol),
    }
    result = {
        'config': {'seeds': list(seeds), 'epochs': epochs, 'lr': lr,
                   'batch': batch, 'store_hardness': HARD,
                   'stores': {'MELD': '96/32/40 clips, store seed 100',
                              'C-EXPR-DB': '72/28 clips (test=val), '
                                           'store seed 200'},
                   'init': 'matched per seed (reference init state_dict '
                           'ported into fvt_tpu)',
                   'wf1_tol': wf1_tol, 'mean_tol': mean_tol,
                   'saturation_cap': saturation_cap, 'floor': floor},
        'selection_semantics': {
            'MELD': 'video-level W-F1 per aggregation rule '
                    '(reference trainer.py:662-668)',
            'C-EXPR-DB': 'frame-level W-F1 per ignore-class slice '
                         '(reference trainer.py:648-654, '
                         'use_other_class)'},
        'per_seed': per_seed,
        'summary': summary,
        'reference_cell_range': [float(min(all_ref)),
                                 float(max(all_ref))],
        'max_delta_W_F1': float(max(all_deltas)),
        'checks': checks,
        'ok': all(checks.values()),
    }
    print(json.dumps({k: result[k] for k in
                      ('summary', 'reference_cell_range',
                       'max_delta_W_F1', 'checks', 'ok')}, indent=2))
    if out_json:
        with open(out_json, 'w') as f:
            json.dump(result, f, indent=2)
        print(f'wrote {out_json}')
    return result


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default='/tmp/fvt_twin_acc')
    p.add_argument('--seeds', default='0,1,2')
    p.add_argument('--epochs', type=int, default=8)
    p.add_argument('--lr', type=float, default=0.01)
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--out', default=None)
    p.add_argument('--resummarize', default=None, metavar='JSON',
                   help='recompute the summary (incl. derived stats) '
                        'of an EXISTING verdict json from its per-seed '
                        'rows, no retraining')
    a = p.parse_args()
    if a.resummarize:
        d = resummarize(a.resummarize)
        print(json.dumps(d['summary'], indent=2))
        sys.exit(0 if d['ok'] else 1)
    res = main(a.workdir, tuple(int(s) for s in a.seeds.split(',')),
               a.epochs, a.lr, a.batch, out_json=a.out)
    sys.exit(0 if res['ok'] else 1)
