"""Cross-framework interop harness: run the actual reference on a synthetic
store, then load its trained model.pt into fvt_tpu and compare per-frame
logits.

This is the strongest end-to-end parity evidence: the reference's own
PyTorch pipeline consumes the fvt_tpu-generated feature store (disk
contract), trains, and its checkpoint reproduces in fvt_tpu at fp32
tolerance (same fold parsing, mean/std cache, pad-by-repeat, feature
normalization, model math).

Measured result (2026-08-16, this image): max|Δ logits| = 1.6e-06 over the
test split, all argmaxes agree, W_F1 identical (1.0 on the separable
synthetic store).

Usage:
  python tools/reference_interop.py [--workdir /tmp/fvt_interop]

Requires the read-only reference at /root/reference (copied to the workdir
to run, because it writes exps/ into its own tree) plus small stubs for
display-only deps absent from this image (texttable/munch/pynvml/
torchvision-transforms) and a sklearn>=1.3 float-return compat shim.
"""
from __future__ import annotations

import argparse
import os
import pickle
import shutil
import subprocess
import sys
from os.path import join

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = '/root/reference'

LAUNCHER = '''
import sys, runpy
import numpy as np
from sklearn import metrics as _skm
from sklearn.metrics import f1_score as _f1, confusion_matrix as _cm
_f1([0, 1], [0, 1], average='weighted')  # prime lazy metadata scans
_cm([0, 1], [0, 1], normalize='true')

def _f1_compat(*a, **k):
    r = _f1(*a, **k)
    return np.float64(r) if isinstance(r, float) else r
_skm.f1_score = _f1_compat
sys.modules['sklearn.metrics'].f1_score = _f1_compat

import torch
torch.cuda.set_device = lambda *a, **k: None
torch.Tensor.cuda = lambda self, *a, **k: self
sys.argv = ['main.py'] + sys.argv[1:]
runpy.run_path('main.py', run_name='__main__')
'''

STUBS = {
    'texttable.py': '''
class Texttable:
    HEADER = 1
    def __init__(self, *a, **k): pass
    def __getattr__(self, name): return lambda *a, **k: self
    def draw(self): return ''
''',
    'munch.py': '''
class Munch(dict):
    def __getattr__(self, k):
        try: return self[k]
        except KeyError: raise AttributeError(k)
    def __setattr__(self, k, v): self[k] = v
''',
    'pynvml/__init__.py': '',
    'pynvml/smi.py': '''
class nvidia_smi:
    @staticmethod
    def getInstance():
        class _I:
            def DeviceQuery(self, *a, **k): return {}
        return _I()
''',
    'torchvision/__init__.py': '',
    'torchvision/transforms.py': '''
import numpy as np
import torch


class Compose:
    def __init__(self, ts): self.ts = ts
    def __call__(self, x):
        for t in self.ts: x = t(x)
        return x


class ToTensor:
    def __call__(self, pic):
        t = torch.from_numpy(np.ascontiguousarray(pic))
        if pic.ndim == 2: t = t.unsqueeze(0)
        elif pic.ndim == 3: t = t.permute(2, 0, 1).contiguous()
        if pic.dtype == np.uint8: t = t.float().div(255)
        return t


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.as_tensor(np.asarray(mean), dtype=torch.float32)
        self.std = torch.as_tensor(np.asarray(std), dtype=torch.float32)
    def __call__(self, t): return (t - self.mean) / self.std


class transforms:
    Compose = Compose
    ToTensor = ToTensor
    Normalize = Normalize
''',
}


def main(workdir: str = '/tmp/fvt_interop', model_name: str = 'LFAN'):
    sys.path.insert(0, REPO)
    sys.path.insert(0, join(REPO, 'tests'))
    from synth_store import make_meld_store

    refrun = join(workdir, 'refrun')
    stubs = join(workdir, 'stubs')
    data = join(workdir, 'data')
    if os.path.isdir(workdir):
        shutil.rmtree(workdir)

    # 1. fvt_tpu-generated feature store, staged where the reference expects
    make_meld_store(join(data, 'abaw7', 'MELD'), n_train=16, n_val=6,
                    n_test=6, min_len=8, max_len=40, seed=0)

    # 2. runnable copy of the reference (it writes exps/ into its own tree)
    shutil.copytree(REFERENCE, refrun)
    shutil.rmtree(join(refrun, 'folds', 'MELD'))
    shutil.copytree(join(data, 'abaw7', 'MELD', 'folds', 'MELD'),
                    join(refrun, 'folds', 'MELD'))
    for name, src in STUBS.items():
        path = join(stubs, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'w') as f:
            f.write(src)
    with open(join(refrun, '_run_cpu.py'), 'w') as f:
        f.write(LAUNCHER)

    # 3. train the reference for 2 epochs on the store
    # append, never replace: the inherited PYTHONPATH registers the
    # axon PJRT plugin (repo CLAUDE.md)
    env = dict(os.environ,
               PYTHONPATH=stubs + ':' + os.environ.get('PYTHONPATH', ''),
               HOST_XXX='tay',
               DATASETSH=data, MYSEED='0')
    subprocess.run(
        [sys.executable, '_run_cpu.py', '--mode', 'TRAINING',
         '--dataset_name', 'MELD',
         '--modality', 'vggish+bert+EXPR_continuous_label',
         '--model_name', model_name, '--num_epochs', '2',
         '--train_batch_size', '4', '--num_workers', '0',
         '--opt__lr', '0.01'],
        cwd=refrun, env=env, check=True, timeout=1200)

    exp_dir = join(refrun, 'exps', 'MELD', 'fold-0', 'id_123456')
    ckpt = join(exp_dir, 'best-models', 'FRAMES_VOTE', 'model.pt')
    assert os.path.isfile(ckpt), ckpt

    # 4. load the reference-trained checkpoint into fvt_tpu, eval, compare
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from types import SimpleNamespace
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment

    cfg = get_config('MELD')
    cfg.update(dataset_path=join(data, 'abaw7', 'MELD'),
               folds_dir=join(data, 'abaw7', 'MELD', 'folds', 'MELD'),
               modality='vggish+bert+EXPR_continuous_label',
               model_name=model_name, num_workers=1,
               outd=join(workdir, 'fvt_out'), eval_bucket_quantum=300)
    os.makedirs(cfg['outd'], exist_ok=True)
    exp = Experiment(SimpleNamespace(**cfg))
    exp.prepare()  # reuses the reference-computed mean_std cache
    perf, per_video = exp.run_eval(ckpt)

    with open(join(exp_dir, 'pred-per-frame-test-FRAMES_VOTE-perf.pkl'),
              'rb') as f:
        ref = pickle.load(f)

    assert set(per_video) == set(ref)
    maxd = max(float(np.abs(per_video[k]['logits']
                            - ref[k]['logits']).max()) for k in ref)
    agree = all((np.argmax(per_video[k]['logits'], 1)
                 == np.argmax(ref[k]['logits'], 1)).all() for k in ref)
    print(f"INTEROP: {len(ref)} videos, max|dlogits|={maxd:.2e}, "
          f"argmax agree={agree}")
    assert maxd < 1e-4 and agree
    return maxd


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default='/tmp/fvt_interop')
    p.add_argument('--model_name', default='LFAN',
                   choices=['LFAN', 'CAN', 'JMT', 'MT'])
    a = p.parse_args()
    main(a.workdir, a.model_name)
