#!/usr/bin/env python
"""Mini cross-validation campaign through the whole product.

The reference's C-EXPR-DB protocol is 5-fold CV (folds/ tree,
/root/reference/base/dataset.py:63-141) whose summaries it leaves to
hand-work.  This driver runs the REAL pipeline end-to-end —
``folds x seeds`` full ``fvt_tpu.main`` CLI trainings on one synthetic
non-separable C-EXPR-DB-shaped store (tests/synth_store.py hardness
knobs), gated on each run's ``passed.txt`` — then aggregates with
``tools/summarize_runs.py`` and writes the per-fold rows + mean+/-std
table.  docs/CV_CAMPAIGN_r05.md holds a committed run of it.

Usage:
  python tools/cv_campaign.py [--workdir /tmp/fvt_cv] [--folds 2]
      [--seeds 0,1] [--epochs 6] [--out docs/CV_CAMPAIGN.md]
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
from os.path import join

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, join(REPO, 'tests'))
sys.path.insert(0, join(REPO, 'tools'))


from toolenv import cpu_env as _cpu_env  # noqa: E402


def main(workdir='/tmp/fvt_cv', folds=2, seeds=(0, 1), epochs=6,
         out_md=None):
    if os.path.isdir(workdir):
        shutil.rmtree(workdir)
    from synth_store import make_cexpr_store
    store = make_cexpr_store(join(workdir, 'store'), n_train=40,
                             n_val=16, min_len=8, max_len=30, seed=300,
                             separation=0.8, label_noise=0.25,
                             ambiguity=0.25, n_folds=folds, video_hw=8)
    exps = join(workdir, 'exps')
    runs = []
    for fold in range(folds):
        for seed in seeds:
            outd = join(exps, f'fold{fold}_seed{seed}')
            print(f'== cv_campaign: fold {fold} seed {seed} '
                  f'({epochs} epochs) ==', flush=True)
            cmd = [sys.executable, '-m', 'fvt_tpu.main',
                   '--dataset_name', 'C-EXPR-DB',
                   '--dataset_path', store['dataset_path'],
                   '--folds_dir', store['folds_dir'],
                   '--fold_to_run', str(fold), '--seed', str(seed),
                   '--modality', 'vggish+bert+EXPR_continuous_label',
                   '--model_name', 'LFAN', '--use_other_class', 'true',
                   '--num_epochs', str(epochs),
                   '--train_batch_size', '4', '--num_workers', '1',
                   '--window_length', '16', '--hop_length', '8',
                   '--eval_bucket_quantum', '16',
                   '--eval_window_batch', '4', '--outd', outd]
            r = subprocess.run(cmd, env=_cpu_env(), cwd=REPO,
                               capture_output=True, text=True,
                               timeout=1800)
            if r.returncode != 0:
                print(r.stdout[-2000:], r.stderr[-2000:])
                raise SystemExit(f'fold {fold} seed {seed} failed')
            assert os.path.isfile(join(outd, 'passed.txt')), outd
            runs.append(outd)

    import summarize_runs as sr
    summary = sr.summarize([exps])
    table = sr.render(summary)
    assert len(summary['runs']) == folds * len(seeds) * 2, \
        (len(summary['runs']), 'expect 2 selection items per run')
    header = (f'CV campaign: {folds} folds x {list(seeds)} seeds, '
              f'{epochs} epochs, synthetic non-separable C-EXPR-DB '
              f'store (separation=0.8, label_noise=0.25, '
              f'ambiguity=0.25, 56 trials)\n'
              f'command: python tools/cv_campaign.py --folds {folds} '
              f'--seeds {",".join(map(str, seeds))} --epochs {epochs}\n')
    print(header)
    print(table)
    if out_md:
        with open(out_md, 'w') as f:
            f.write('# Mini CV campaign (real runs, aggregated)\n\n'
                    + header + '\n```\n' + table + '\n```\n')
        print(f'wrote {out_md}')
    return summary


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default='/tmp/fvt_cv')
    p.add_argument('--folds', type=int, default=2)
    p.add_argument('--seeds', default='0,1')
    p.add_argument('--epochs', type=int, default=6)
    p.add_argument('--out', default=None)
    a = p.parse_args()
    main(a.workdir, a.folds, tuple(int(s) for s in a.seeds.split(',')),
         a.epochs, a.out)
