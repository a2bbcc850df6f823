#!/usr/bin/env python
"""One-command in-image acceptance drive of the WHOLE product.

Runs the full user journey on a throwaway synthetic store, asserting
every artifact the contract promises (the reference's artifact contract
plus the serving surfaces this framework adds):

  1. build a synthetic MELD-shaped feature store (tests/synth_store.py)
  2. fsck it (tools/validate_store.py --deep, must be clean)
  3. train 2 epochs through the real CLI (python -m fvt_tpu.main),
     checking the artifact contract: passed.txt, config.yml, log.json,
     test-*-perf.{txt,pkl}, best-models/<item>/model.msgpack
     (/root/reference/parseit.py:311-315 + trainer.py:716-760 lineage)
  4. EVALUATION retarget of the trained run onto a synthetic challenge
     store (python -m fvt_tpu.inference_challenge) -> prediction.pkl
  5. export the frozen serving artifact (tools/export_serving.py)
  6. serve it over HTTP (tools/serve_http.py): healthz, one /logits
     call, and one full streamed session via fvt_tpu.client — the
     streamed logits must equal the offline call on the same frames
  7. aggregate the run with tools/summarize_runs.py (one table row)

Exit 0 = the product works end-to-end in this image today.  ~2-4 min on
CPU.  Usage::

    python tools/quickstart.py [--workdir /tmp/fvt_quickstart] [--keep]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import time
import urllib.request
from os.path import isfile, join

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, join(REPO, 'tests'))
sys.path.insert(0, join(REPO, 'tools'))

PASS = []


def step(name):
    print(f'\n== quickstart: {name} ==', flush=True)
    PASS.append(name)


from toolenv import cpu_env as _cpu_env  # noqa: E402  (shared recipe:
# the acceptance drive must not depend on, or wedge against, TPU
# hardware)


def run_cli(cmd, **kw):
    r = subprocess.run(cmd, env=_cpu_env(), capture_output=True,
                       text=True, timeout=kw.pop('timeout', 900), **kw)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f'quickstart FAILED at {PASS[-1]}: '
                         f'{cmd[:3]}... exit {r.returncode}')
    return r


def main(workdir='/tmp/fvt_quickstart', keep=False):
    import numpy as np
    if os.path.isdir(workdir):
        shutil.rmtree(workdir)
    os.makedirs(workdir)

    # 1. synthetic store ---------------------------------------------------
    step('build synthetic store')
    from synth_store import make_meld_store, make_cexpr_store
    store = make_meld_store(join(workdir, 'store'), n_train=12, n_val=4,
                            n_test=4, min_len=6, max_len=20)

    # 2. fsck --------------------------------------------------------------
    step('fsck (validate_store --deep)')
    run_cli([sys.executable, join(REPO, 'tools', 'validate_store.py'),
             '--dataset_path', store['dataset_path'],
             '--dataset_name', 'MELD',
             '--folds_dir', store['folds_dir'], '--deep'])

    # 3. train 2 epochs through the real CLI -------------------------------
    step('train (fvt_tpu.main, 2 epochs)')
    outd = join(workdir, 'run')
    run_cli([sys.executable, '-m', 'fvt_tpu.main',
             '--dataset_name', 'MELD',
             '--dataset_path', store['dataset_path'],
             '--folds_dir', store['folds_dir'],
             '--modality', 'vggish+bert+EXPR_continuous_label',
             '--model_name', 'LFAN', '--num_epochs', '2',
             '--train_batch_size', '4', '--num_workers', '1',
             '--window_length', '8', '--hop_length', '4',
             '--eval_bucket_quantum', '8', '--eval_window_batch', '4',
             '--outd', outd], cwd=REPO)
    for f in ('passed.txt', 'config.yml', 'log.json',
              'test-FRAMES_VOTE-perf.pkl', 'test-FRAMES_VOTE-perf.txt',
              join('best-models', 'FRAMES_VOTE', 'model.msgpack')):
        assert isfile(join(outd, f)), f'missing run artifact: {f}'

    # 4. EVALUATION retarget onto a challenge store ------------------------
    step('challenge inference (EVALUATION retarget)')
    ch = make_cexpr_store(join(workdir, 'challenge'),
                          ds='C-EXPR-DB-CHALLENGE', n_train=3,
                          min_len=6, max_len=12, video_hw=64)
    run_cli([sys.executable, '-m', 'fvt_tpu.inference_challenge',
             '--mode', 'EVALUATION', '--fd_exp', outd,
             '--case_best_model', 'FRAMES_VOTE',
             '--target_ds_name', 'C-EXPR-DB-CHALLENGE',
             '--dataset_path', ch['dataset_path'],
             '--folds_dir', ch['folds_dir'],
             '--eval_window_batch', '4'], cwd=REPO)
    pred_path = join(outd, 'eval-C-EXPR-DB-CHALLENGE',
                     'pred-C-EXPR-DB-CHALLENGE', 'prediction.pkl')
    assert isfile(pred_path), f'missing {pred_path}'

    # 5. frozen serving artifact -------------------------------------------
    step('export serving artifact (.fvtserve)')
    art = join(workdir, 'serving.fvtserve')
    run_cli([sys.executable, join(REPO, 'tools', 'export_serving.py'),
             '--fd_exp', outd, '--out', art, '--platforms', 'cpu',
             '--window_batch', '4'])
    assert isfile(art) and os.path.getsize(art) > 1000

    # 6. HTTP serving: one logits call + one streamed session --------------
    step('serve over HTTP (logits + streamed session)')
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    srv = subprocess.Popen(
        [sys.executable, join(REPO, 'tools', 'serve_http.py'),
         '--artifact', art, '--port', str(port), '--no_aot',
         # belt-and-braces with _cpu_env: the artifact is exported
         # cpu-only above, so pin the backend in-process too
         '--force_cpu'],
        env=_cpu_env(), stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT)
    try:
        base = f'http://127.0.0.1:{port}'
        for _ in range(120):
            try:
                urllib.request.urlopen(base + '/healthz', timeout=2)
                break
            except Exception:
                if srv.poll() is not None:
                    raise SystemExit('serve_http died during startup')
                time.sleep(1)
        else:
            raise SystemExit('serve_http never became healthy')

        from fvt_tpu.client import ServingClient
        c = ServingClient(base)
        rng = np.random.default_rng(0)
        batch = {'vggish': rng.normal(size=(4, 8, 128)
                                      ).astype(np.float32),
                 'bert': rng.normal(size=(4, 8, 768)).astype(np.float32)}
        logits = c.logits(batch)
        assert logits.shape == (4, 8, 7), logits.shape

        clip = {'vggish': rng.normal(size=(13, 128)).astype(np.float32),
                'bert': rng.normal(size=(13, 768)).astype(np.float32)}
        streamed = c.stream(clip, chunk=5)
        assert streamed.shape == (13, 7), streamed.shape
        assert np.isfinite(streamed).all()
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()
            srv.wait()

    # 7. cross-run summary --------------------------------------------------
    step('summarize_runs over the completed run')
    sj = join(workdir, 'summary.json')
    r = run_cli([sys.executable, join(REPO, 'tools', 'summarize_runs.py'),
                 '--roots', workdir, '--json', sj])
    with open(sj) as f:
        summary = json.load(f)
    assert len(summary['runs']) >= 3, summary  # one row per criterion
    print(r.stdout[-1500:])

    print(f'\nquickstart OK — all {len(PASS)} stages passed: '
          f'{", ".join(PASS)}')
    if not keep:
        shutil.rmtree(workdir)
    return 0


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default='/tmp/fvt_quickstart')
    p.add_argument('--keep', action='store_true',
                   help='keep the workdir for inspection')
    a = p.parse_args()
    sys.exit(main(a.workdir, a.keep))
