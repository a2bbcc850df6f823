"""Twin-training accuracy-equivalence harness: train the IMPORTED torch
reference and fvt_tpu on the SAME synthetic MELD-shaped feature store
with matched config, and compare

  * final test W-F1 under all three aggregation rules
    (FRAMES_VOTE / FRAMES_AVG_PROBS / FRAMES_AVG_LOGITS,
    /root/reference/trainer.py:716-750, metrics.py:196-462),
  * the per-epoch validation W-F1 curves,
  * a deterministic LOCKSTEP leg per model family (LFAN/CAN/JMT/MT,
    plus LFAN_REG = the REGRESSION task's tanh head under CCCLoss;
    dropout zeroed, matched init, same fixed batch cycle in both
    stacks): per-step train losses and the final held-out eval loss
    must agree at fp32-drift tolerance — this
    is the per-step optimizer/model interaction check that full-run
    loss envelopes can't be (with dropout live and independent
    shuffles, trajectories on a tiny separable store legitimately
    diverge),

then close the loop the OTHER way: export the fvt-trained best model to
a torch ``model.pt`` (tools/port_checkpoint.py --reverse), load it into
the reference with ``load_state_dict(strict=True)``
(/root/reference/experiment.py:242-247) via a zero-epoch reference run,
and compare the reference's per-frame test logits against fvt's at fp32
tolerance.

This is the only evidence class that catches optimizer/scheduler/
selection *interaction* bugs that piecewise parity can't: both stacks
start from independent random inits, so the claim is statistical (both
converge to the same accuracy on a separable store under the same
schedule), while the reverse-deployment leg is exact (same weights must
give the same logits through two independent eval pipelines).

Usage:
  python tools/twin_train.py [--workdir /tmp/fvt_twin] [--epochs 5]
                             [--out TWIN_TRAIN.json]

Writes a machine-readable verdict JSON (see `summarize`), exits nonzero
if any tolerance is violated.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import re
import shutil
import subprocess
import sys
from os.path import join

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, join(REPO, 'tools'))
sys.path.insert(0, join(REPO, 'tests'))

import reference_interop as RI  # noqa: E402  (STUBS + LAUNCHER reuse)

CRITERIA = ('FRAMES_VOTE', 'FRAMES_AVG_PROBS', 'FRAMES_AVG_LOGITS')

# Prepended to the reference launcher: record per-epoch train losses
# (the reference never logs them — trainer.py:399 keeps them in memory),
# and optionally strict-load a state dict into the freshly-built model
# so a zero-epoch run becomes an evaluation of OUR exported weights.
TWIN_PATCH = '''
import os as _os
import trainer as _trainer_mod
_orig_toe = _trainer_mod.Trainer.train_one_epoch
def _twin_toe(self):
    _loss = _orig_toe(self)
    _lf = _os.environ.get('TWIN_LOSS_FILE')
    if _lf:
        with open(_lf, 'a') as _f:
            _f.write(f"{_loss}\\n")
    return _loss
_trainer_mod.Trainer.train_one_epoch = _twin_toe

_twin_load = _os.environ.get('TWIN_LOAD_PT')
_twin_save = _os.environ.get('TWIN_SAVE_INIT')
_twin_nodrop = _os.environ.get('TWIN_ZERO_DROPOUT')
if _twin_load or _twin_save or _twin_nodrop:
    import experiment as _exp_mod
    import torch as _torch
    _orig_init_model = _exp_mod.Experiment.init_model
    def _twin_init_model(self):
        _m = _orig_init_model(self)
        if _twin_load:
            _m.load_state_dict(
                _torch.load(_twin_load, map_location='cpu'), strict=True)
            print(f'TWIN: strict-loaded {_twin_load}')
        elif _twin_save and not _os.path.isfile(_twin_save):
            _torch.save(_m.state_dict(), _twin_save)
            print(f'TWIN: saved init state_dict to {_twin_save}')
        if _twin_nodrop:
            _n = 0
            for _mod in _m.modules():
                if isinstance(_mod, _torch.nn.Dropout):
                    _mod.p = 0.0
                    _n += 1
            print(f'TWIN: zeroed {_n} dropout modules')
        return _m
    _exp_mod.Experiment.init_model = _twin_init_model
'''

_CURVE_RE = re.compile(
    r'val: Current MASTER: None, W_F1, VIDEO_LEVEL, (\w+): ([0-9.]+)')


def _stage_refrun(workdir: str, name: str, data: str,
                  ds: str = 'MELD') -> str:
    """Runnable copy of the reference with twin-patched launcher."""
    refrun = join(workdir, name)
    shutil.copytree(RI.REFERENCE, refrun)
    shutil.rmtree(join(refrun, 'folds', ds))
    shutil.copytree(join(data, 'abaw7', ds, 'folds', ds),
                    join(refrun, 'folds', ds))
    anchor = "sys.argv = ['main.py']"
    # str.replace is silent on a missed anchor: the patch would no-op,
    # TWIN_LOSS_FILE would never be written, and worse, a zero-epoch
    # TWIN_LOAD_PT leg would evaluate RANDOM-init reference weights and
    # report a real-looking equivalence failure. Fail here instead.
    assert anchor in RI.LAUNCHER, (
        'reference_interop.LAUNCHER no longer contains the twin-patch '
        f'anchor {anchor!r}; update TWIN_PATCH injection in twin_train')
    launcher = RI.LAUNCHER.replace(anchor, TWIN_PATCH + '\n' + anchor)
    with open(join(refrun, '_run_cpu.py'), 'w') as f:
        f.write(launcher)
    return refrun


def _run_reference(refrun: str, stubs: str, data: str, epochs: int,
                   lr: float, batch: int, loss_file: str = None,
                   load_pt: str = None, save_init: str = None,
                   timeout: int = 3600, ds: str = 'MELD',
                   seed: int = 0, extra_args: tuple = ()) -> str:
    env = dict(os.environ,
               PYTHONPATH=stubs + ':' + os.environ.get('PYTHONPATH', ''),
               HOST_XXX='tay', DATASETSH=data, MYSEED=str(seed))
    if loss_file:
        env['TWIN_LOSS_FILE'] = loss_file
    if load_pt:
        env['TWIN_LOAD_PT'] = load_pt
    if save_init:
        env['TWIN_SAVE_INIT'] = save_init
    subprocess.run(
        [sys.executable, '_run_cpu.py', '--mode', 'TRAINING',
         '--dataset_name', ds,
         '--modality', 'vggish+bert+EXPR_continuous_label',
         '--model_name', 'LFAN', '--num_epochs', str(epochs),
         '--train_batch_size', str(batch), '--num_workers', '0',
         '--opt__lr', str(lr), '--seed', str(seed), *extra_args],
        cwd=refrun, env=env, check=True, timeout=timeout)
    return join(refrun, 'exps', ds, 'fold-0', 'id_123456')


def _parse_ref_valid_curves(log_txt: str) -> dict:
    """Per-criterion validation W-F1 curve from the reference's
    'val: Current MASTER ... (EP. n)' log lines."""
    curves = {c: [] for c in CRITERIA}
    with open(log_txt) as f:
        for line in f:
            m = _CURVE_RE.search(line)
            if m and m.group(1) in curves:
                curves[m.group(1)].append(float(m.group(2)))
    return curves


def _test_wf1(outd: str) -> dict:
    """Final test metrics per criterion from test-<crit>-perf.pkl
    (identical artifact contract in both stacks)."""
    out = {}
    for crit in CRITERIA:
        with open(join(outd, f'test-{crit}-perf.pkl'), 'rb') as f:
            perf = pickle.load(f)
        p = perf[None]
        out[crit] = {
            'W_F1': float(p['W_F1']['VIDEO_LEVEL'][crit]['master']),
            'MACRO_F1': float(p['MACRO_F1']['VIDEO_LEVEL'][crit]['master']),
            'CL_ACC': float(p['CL_ACC']['VIDEO_LEVEL'][crit]['master']),
        }
    return out


def _train_fvt(workdir: str, data: str, epochs: int, lr: float,
               batch: int, init_pt: str = None, ds: str = 'MELD',
               seed: int = 0, outd_name: str = 'fvt_out',
               extra_cfg: dict = None):
    """Train fvt_tpu in-process on CPU with the matched config (and the
    reference's saved INITIAL weights when ``init_pt`` is given, so the
    loss trajectories start from the same point); returns
    (outd, loss_curve, valid_curves)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from types import SimpleNamespace
    from fvt_tpu import constants
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment

    outd = join(workdir, outd_name)
    cfg = get_config(ds)
    cfg.update(dataset_path=join(data, 'abaw7', ds),
               folds_dir=join(data, 'abaw7', ds, 'folds', ds),
               modality='vggish+bert+EXPR_continuous_label',
               model_name='LFAN', num_workers=1, seed=seed,
               num_epochs=epochs, min_num_epochs=min(epochs, 5),
               train_batch_size=batch, opt__lr=lr,
               outd=outd, eval_bucket_quantum=300)
    cfg.update(extra_cfg or {})
    os.makedirs(outd, exist_ok=True)
    exp = Experiment(SimpleNamespace(**cfg))
    exp.prepare()  # reuses the reference-computed mean/std cache

    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    if init_pt:
        exp._load_torch_ckpt(trainer, init_pt)

    losses = []
    orig_toe = trainer.train_one_epoch

    def record_toe(loader, epoch):
        loss = orig_toe(loader, epoch)
        losses.append(float(loss))
        return loss

    trainer.train_one_epoch = record_toe
    valid_tracker, _ = trainer.optimize(
        loaders[constants.TRAINSET], loaders[constants.VALIDSET],
        loaders[constants.TESTSET])

    curves = {crit: [float(t._master_value(p))
                     for p in valid_tracker[crit].holder_list]
              for crit, t in valid_tracker.items()}
    return outd, losses, curves


def _make_lockstep_ref(model_name: str, T: int):
    """Construct the torch reference model for a lockstep leg.

    LFAN/CAN run feature-only (vggish+bert).  JMT/MT require a raw
    'video' stream through a frozen spatial backbone (model.py:1138-1143
    reshapes (B, T, C, W, H) unconditionally), so they get a tiny FROZEN
    stand-in linear backbone (requires_grad=False like the reference's
    load_visual_backbone, model.py:1115-1117) — identical weights are
    grafted into the fvt side."""
    import torch
    from conftest import add_reference_to_path
    add_reference_to_path()
    from fvt_tpu.config import model_config as MC
    from fvt_tpu import constants

    if model_name in ('LFAN', 'LFAN_REG'):
        # LFAN_REG: the REGRESSION task head (output_dim=1 + tanh,
        # model.py:485+523) trained under CCCLoss
        # (base/loss_function.py:6-24 via base/trainer.py:278)
        from models.model import LFAN as RefLFAN
        reg = model_name == 'LFAN_REG'
        return RefLFAN(backbone_settings=MC.BACKBONE_SETTINGS,
                       output_dim=1 if reg else 7,
                       task=(constants.REGRESSION if reg
                             else constants.CLASSIFICATION),
                       modality=['vggish', 'bert'], example_length=T,
                       kernel_size=5, tcn_channel=MC.TCN_CHANNELS,
                       modal_dim=32, num_heads=2, root_dir='',
                       device='cpu')
    if model_name == 'CAN':
        from models.model import CAN as RefCAN
        return RefCAN(task=constants.CLASSIFICATION,
                      modalities=['vggish', 'bert'],
                      tcn_settings=MC.TCN_SETTINGS,
                      backbone_settings=MC.BACKBONE_SETTINGS,
                      output_dim=7, root_dir='', device='cpu')
    if model_name in ('JMT', 'MT'):
        from models.model import JMT as RefJMT

        class _DummySpatialTorch(torch.nn.Module):
            def __init__(self):
                super().__init__()
                torch.manual_seed(7)
                self.fc = torch.nn.Linear(3 * 8 * 8, 512)
                for p in self.parameters():
                    p.requires_grad = False

            def forward(self, x):
                return self.fc(x.reshape(x.shape[0], -1))

        orig = RefJMT.load_visual_backbone
        RefJMT.load_visual_backbone = (
            lambda self, backbone_settings: _DummySpatialTorch())
        try:
            return RefJMT(task=constants.CLASSIFICATION,
                          modalities=['video', 'vggish'],
                          tcn_settings=MC.TCN_SETTINGS,
                          backbone_settings=MC.BACKBONE_SETTINGS,
                          output_dim=7, root_dir='', device='cpu',
                          model_name=model_name)
        finally:
            RefJMT.load_visual_backbone = orig
    raise ValueError(f'unknown lockstep model: {model_name}')


def _lockstep_probe(init_pt: str, model_name: str = 'LFAN',
                    n_steps: int = 12, n_batches: int = 4,
                    B: int = 4, T: int = 300, lr: float = 0.01,
                    x64: bool = False) -> dict:
    """Deterministic N-step lockstep: both stacks start from the SAME
    init (``init_pt``), dropout zeroed everywhere, and take ``n_steps``
    optimizer steps on the SAME cycle of fixed batches — per-step train
    losses and the final held-out eval loss must match at fp32-drift
    tolerance.  This is the check the full twin-train loss envelope
    cannot be: with dropout live and independent shuffles, trajectories
    on a tiny separable store legitimately diverge (the r4 probe showed
    one-step update parity is EXACT: both stacks reach eval loss 2.1496
    from matched init on an identical batch), so curve gaps are RNG
    weather, while a lockstep mismatch would be an optimizer/model
    interaction bug.  Matches /root/reference/trainer.py:399-430 (train
    step) + optimizer construction.  ``model_name`` covers all four
    fusion families (LFAN/CAN default feature-only; JMT/MT run a raw
    video stream through a frozen stand-in backbone, exercising the
    split_frozen no-grad/no-decay path against torch requires_grad=False)
    plus 'LFAN_REG': the REGRESSION task (tanh head, CCCLoss gradient,
    continuous labels — base/trainer.py:278 + base/loss_function.py)."""
    import torch
    import jax
    import jax.numpy as jnp
    import optax
    from conftest import add_reference_to_path
    add_reference_to_path()
    from fvt_tpu.config import model_config as MC
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu import constants
    from fvt_tpu.models import torch_port as port
    from fvt_tpu.models.models import LFAN, CAN, JMT
    from fvt_tpu.train import optim as O
    from fvt_tpu.train.steps import create_train_state, make_train_step

    sd = torch.load(init_pt, map_location='cpu')
    task = (constants.REGRESSION if model_name == 'LFAN_REG'
            else constants.CLASSIFICATION)

    # --- torch reference, dropout zeroed, TRAIN mode
    ref = _make_lockstep_ref(model_name, T)
    if model_name in ('LFAN', 'LFAN_REG'):
        ref.init()
    ref.load_state_dict(sd, strict=True)
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    ref.train()
    if task == constants.REGRESSION:
        from base.loss_function import CCCLoss
        crit = CCCLoss()  # called criterion(labels, outputs) like
        # base/trainer.py:278
    else:
        crit = torch.nn.CrossEntropyLoss(reduction='mean')
    opt = torch.optim.SGD(ref.parameters(), lr=lr, momentum=0.9,
                          nesterov=True, weight_decay=1e-4)

    # --- fvt_tpu, dropout-zero model, same ported init
    if model_name in ('LFAN', 'LFAN_REG'):
        modality = ('vggish', 'bert')
        params, stats = port.lfan_from_torch(sd, list(modality),
                                             MC.TCN_CHANNELS,
                                             MC.EMBEDDING_DIM)
        model = LFAN(modality=modality,
                     output_dim=1 if task == constants.REGRESSION else 7,
                     task=task, tcn_dropout=0.0, fusion_dropout=0.0)
    elif model_name == 'CAN':
        modality = ('vggish', 'bert')
        params, stats = port.can_from_torch(sd, list(modality),
                                            MC.TCN_SETTINGS)
        model = CAN(modality=modality, output_dim=7, tcn_dropout=0.0)
    else:  # JMT / MT
        modality = ('video', 'vggish')
        params, stats = port.jmt_from_torch(sd, list(modality),
                                            MC.TCN_SETTINGS,
                                            joint=(model_name == 'JMT'))
        # graft the frozen stand-in backbone: torch flattens (C, H, W),
        # flax flattens (H, W, C) — permute the columns accordingly
        import flax.linen as nn
        from fvt_tpu.models.layers import TorchLinear

        w = port._np(sd['spatial.visual.fc.weight'])  # (512, 3*8*8)
        w = w.reshape(512, 3, 8, 8).transpose(0, 2, 3, 1).reshape(512, -1)
        params['spatial_video'] = {'dense': {'dense': {
            'kernel': w.T,
            'bias': port._np(sd['spatial.visual.fc.bias'])}}}

        class _DummySpatialJax(nn.Module):
            @nn.compact
            def __call__(self, x, *, train: bool = False):  # (N,H,W,C)
                return TorchLinear(512, name='dense')(
                    x.reshape(x.shape[0], -1))

        model = JMT(modality=modality, output_dim=7,
                    model_name=model_name, tcn_dropout=0.0,
                    spatial_video=_DummySpatialJax())
    # honor_lr: the lockstep's torch twin is HAND-BUILT with lr passed
    # explicitly (above), unlike the reference's live instantiators
    # which drop it (optim.effective_base_lr) — so the fvt side must
    # honor the configured lr to compare step MATH at the same lr
    hp = O.standardize_opt_params({**get_config('MELD'), 'opt__lr': lr,
                                   'opt__honor_lr': True})
    optimizer = O.build_optimizer(hp)

    prev_x64 = bool(jax.config.jax_enable_x64)
    dt = np.float64 if x64 else np.float32
    if x64:
        # float64 twin: fp32 rounding drift through the deep attention
        # stacks is chaotic (measured ~x3-20 amplification per step on
        # JMT: 5e-6 -> 2.2e-3 over 4 steps while step-0 forward parity
        # holds); re-running in float64 collapses the deltas by orders
        # of magnitude IF the math is identical — the decisive
        # drift-vs-bug discriminator, so JMT/MT lockstep legs run x64
        jax.config.update('jax_enable_x64', True)
        ref.double()
        params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
        stats = jax.tree.map(lambda a: np.asarray(a, np.float64), stats)

    rng = np.random.default_rng(0)

    def _labels():
        if task == constants.REGRESSION:
            # f32-representable values so both stacks see EXACTLY the
            # same continuous labels in the x64 legs too (the fvt step
            # casts labels to the model output dtype)
            return rng.uniform(-1.0, 1.0, size=(B, T)).astype(np.float32)
        return rng.integers(0, 7, size=(B, T))

    if model_name in ('JMT', 'MT'):
        batches = [(rng.normal(size=(B, T, 3, 8, 8)).astype(dt),
                    rng.normal(size=(B, T, 128)).astype(dt),
                    _labels())
                   for _ in range(n_batches + 1)]
    else:
        batches = [(rng.normal(size=(B, T, 128)).astype(dt),
                    rng.normal(size=(B, T, 768)).astype(dt),
                    _labels())
                   for _ in range(n_batches + 1)]
    held_out, batches = batches[-1], batches[:-1]

    def _lab_arr(lab):
        if task == constants.REGRESSION:
            return jnp.asarray(lab.astype(dt))
        return jnp.asarray(lab.astype(np.int32))

    def _ref_loss(out, lab):
        if task == constants.REGRESSION:
            # base/trainer.py:278: criterion(labels, outputs) with
            # (B, T, 1) continuous labels against the tanh head
            return crit(torch.from_numpy(lab.astype(dt)[..., None]), out)
        return crit(out.reshape(B * T, 7),
                    torch.from_numpy(lab.reshape(-1)))

    if model_name in ('JMT', 'MT'):
        def fvt_batch(vid, vg, lab):
            return {'video': jnp.asarray(vid.transpose(0, 1, 3, 4, 2)),
                    'vggish': jnp.asarray(vg),
                    constants.EXPR: _lab_arr(lab)}

        def ref_inputs(vid, vg):
            return {'video': torch.from_numpy(vid.copy()),
                    'vggish': torch.from_numpy(vg[:, None].copy())}
    else:
        def fvt_batch(vg, bt, lab):
            return {'vggish': jnp.asarray(vg), 'bert': jnp.asarray(bt),
                    constants.EXPR: _lab_arr(lab)}

        def ref_inputs(vg, bt):
            return {'vggish': torch.from_numpy(vg[:, None].copy()),
                    'bert': torch.from_numpy(bt[:, None].copy())}

    try:
        from fvt_tpu.train.steps import split_frozen
        init_batch = fvt_batch(*batches[0])
        if x64:
            # init only shapes the param tree (replaced below); flax
            # initializes float32 kernels, so feed it float32 inputs
            init_batch = {k: (v.astype(jnp.float32)
                              if v.dtype == jnp.float64 else v)
                          for k, v in init_batch.items()}
        state = create_train_state(model, optimizer, init_batch,
                                   jax.random.key(0))
        state = state.replace(params=jax.tree.map(jnp.asarray, params),
                              batch_stats=jax.tree.map(jnp.asarray, stats))
        # re-init the optimizer state from the (possibly float64)
        # grafted params so momentum buffers carry the run's dtype
        state = state.replace(
            opt_state=optimizer.init(split_frozen(state.params)[0]))
        step = make_train_step(model, optimizer, task)

        ref_losses, fvt_losses = [], []
        for i in range(n_steps):
            a, b, lab = batches[i % n_batches]
            out = ref(ref_inputs(a, b))
            loss = _ref_loss(out, lab)
            opt.zero_grad()
            loss.backward()
            opt.step()
            ref_losses.append(float(loss.detach()))
            state, fvt_loss = step(state, fvt_batch(a, b, lab),
                                   jax.random.key(i))
            fvt_losses.append(float(fvt_loss))

        # held-out eval loss at the final weights, both stacks EVAL mode
        a, b, lab = held_out
        ref.eval()
        with torch.no_grad():
            out = ref(ref_inputs(a, b))
            ref_eval = float(_ref_loss(out, lab))
        fvt_in = fvt_batch(a, b, lab)
        del fvt_in[constants.EXPR]
        logits = model.apply({'params': state.params,
                              'batch_stats': state.batch_stats},
                             fvt_in, train=False)
        if task == constants.REGRESSION:
            from fvt_tpu.train.losses import ccc_loss
            fvt_eval = float(ccc_loss(jnp.asarray(lab.astype(dt)),
                                      logits[..., 0]))
        else:
            fvt_eval = float(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits.reshape(-1, 7),
                    jnp.asarray(lab.reshape(-1).astype(np.int32))).mean())

        dsteps = [abs(x - y) for x, y in zip(ref_losses, fvt_losses)]
        out = {'model': model_name,
               'n_steps': n_steps,
               'x64': x64,
               'ref_losses': [round(x, 9) for x in ref_losses],
               'fvt_losses': [round(x, 9) for x in fvt_losses],
               'max_step_loss_delta': max(dsteps),
               'final_eval_loss_ref': ref_eval,
               'final_eval_loss_fvt': fvt_eval,
               'final_eval_loss_delta': abs(ref_eval - fvt_eval)}
        if model_name in ('JMT', 'MT'):
            # the frozen stand-in backbone must not move in EITHER stack
            # (torch: requires_grad=False; fvt: steps.split_frozen keeps
            # 'spatial*' out of grads AND the optimizer/weight decay)
            fin_sd = ref.state_dict()
            out['frozen_drift_torch'] = max(
                float((fin_sd[k].double() - sd[k].double()).abs().max())
                for k in sd if k.startswith('spatial.'))
            init_leaves = jax.tree.leaves(params['spatial_video'])
            fin_leaves = jax.tree.leaves(state.params['spatial_video'])
            out['frozen_drift_fvt'] = max(
                float(jnp.abs(jnp.asarray(x) - y).max())
                for x, y in zip(init_leaves, fin_leaves))
        return out
    finally:
        if x64:
            jax.config.update('jax_enable_x64', prev_x64)


def _compare_per_frame(ref_pkl: str, fvt_pkl: str):
    with open(ref_pkl, 'rb') as f:
        ref = pickle.load(f)
    with open(fvt_pkl, 'rb') as f:
        fvt = pickle.load(f)
    assert set(ref) == set(fvt), (sorted(ref)[:3], sorted(fvt)[:3])
    maxd = max(float(np.abs(fvt[k]['logits'] - ref[k]['logits']).max())
               for k in ref)
    agree = all((np.argmax(fvt[k]['logits'], 1)
                 == np.argmax(ref[k]['logits'], 1)).all() for k in ref)
    return maxd, bool(agree)


def main(workdir: str = '/tmp/fvt_twin', epochs: int = 5,
         lr: float = 0.01, batch: int = 4, wf1_tol: float = 0.05,
         out_json: str = None) -> dict:
    if os.path.isdir(workdir):
        shutil.rmtree(workdir)
    data = join(workdir, 'data')
    stubs = join(workdir, 'stubs')

    from synth_store import make_meld_store
    make_meld_store(join(data, 'abaw7', 'MELD'), n_train=64, n_val=16,
                    n_test=16, min_len=8, max_len=40, seed=0)
    for name, src in RI.STUBS.items():
        path = join(stubs, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'w') as f:
            f.write(src)

    # ---- leg 1: the torch reference trains -------------------------------
    print(f'== twin_train: reference ({epochs} epochs) ==', flush=True)
    refrun = _stage_refrun(workdir, 'refrun_train', data)
    ref_loss_file = join(workdir, 'ref_losses.txt')
    init_pt = join(workdir, 'ref_init.pt')  # shared starting point
    ref_exp = _run_reference(refrun, stubs, data, epochs, lr, batch,
                             loss_file=ref_loss_file, save_init=init_pt)
    ref_losses = [float(x) for x in open(ref_loss_file)]
    ref_curves = _parse_ref_valid_curves(join(ref_exp, 'log.txt'))
    ref_test = _test_wf1(ref_exp)

    # ---- leg 2: fvt_tpu trains on the same store, SAME init --------------
    print(f'== twin_train: fvt_tpu ({epochs} epochs) ==', flush=True)
    fvt_outd, fvt_losses, fvt_curves = _train_fvt(workdir, data, epochs,
                                                  lr, batch,
                                                  init_pt=init_pt)
    fvt_test = _test_wf1(fvt_outd)

    # ---- leg 2b: deterministic lockstep (dropout off, same batches) -------
    # LFAN uses the twin run's shared init; the other three families get
    # fresh seeded torch inits (the equivalence claim is per-family:
    # same init -> same per-step losses through both optimizers).
    # Each family runs in float64 — the exactness proof (machine-epsilon
    # agreement: rounding removed, any residual delta would be a real
    # model/optimizer bug) — and the flagship additionally in float32,
    # the production dtype, whose deltas are pure rounding drift
    # (chaotically amplified by deep attention stacks, hence bounded
    # loosely rather than tightly).
    import torch
    lockstep = {}
    for mn in ('LFAN', 'CAN', 'JMT', 'MT', 'LFAN_REG'):
        print(f'== twin_train: lockstep probe {mn} x64 (12 steps, '
              f'dropout off) ==', flush=True)
        if mn == 'LFAN':
            pt = init_pt
        else:
            torch.manual_seed(11)
            m = _make_lockstep_ref(mn, 300)
            if mn == 'LFAN_REG':
                m.init()
            pt = join(workdir, f'lockstep_init_{mn}.pt')
            torch.save(m.state_dict(), pt)
        lockstep[mn] = _lockstep_probe(pt, model_name=mn, x64=True)
    print('== twin_train: lockstep probe LFAN f32 (production dtype) ==',
          flush=True)
    lockstep['LFAN_f32'] = _lockstep_probe(init_pt, model_name='LFAN')

    # ---- leg 3: fvt best model deploys back into the reference -----------
    print('== twin_train: reverse deployment (fvt -> torch) ==', flush=True)
    import port_checkpoint
    rev_pt = join(workdir, 'fvt_best_FRAMES_VOTE.pt')
    port_checkpoint.main(['--reverse', '--model_name', 'LFAN',
                          '--modality', 'vggish+bert',
                          '--in', join(fvt_outd, 'best-models',
                                       'FRAMES_VOTE', 'model.msgpack'),
                          '--out', rev_pt])
    refeval = _stage_refrun(workdir, 'refrun_eval', data)
    ref_eval_exp = _run_reference(refeval, stubs, data, 0, lr, batch,
                                  load_pt=rev_pt)
    rev_maxd, rev_agree = _compare_per_frame(
        join(ref_eval_exp, 'pred-per-frame-test-FRAMES_VOTE-perf.pkl'),
        join(fvt_outd, 'pred-per-frame-test-FRAMES_VOTE-perf.pkl'))
    rev_test = _test_wf1(ref_eval_exp)

    # ---- verdict ----------------------------------------------------------
    deltas = {c: abs(ref_test[c]['W_F1'] - fvt_test[c]['W_F1'])
              for c in CRITERIA}
    loss_ratio = float(np.log(max(fvt_losses[-1], 1e-9))
                       - np.log(max(ref_losses[-1], 1e-9)))
    result = {
        'config': {'epochs': epochs, 'lr': lr, 'batch': batch,
                   'store': '64/16/16 clips, vggish+bert, LFAN, seed 0',
                   'init': 'matched (reference init state_dict ported '
                           'into fvt_tpu; residual divergence = batch '
                           'order + dropout draws)',
                   'wf1_tol': wf1_tol},
        'reference': {'test': ref_test, 'valid_curves': ref_curves,
                      'loss_curve': ref_losses},
        'fvt_tpu': {'test': fvt_test, 'valid_curves': fvt_curves,
                    'loss_curve': fvt_losses},
        'deltas_W_F1': deltas,
        'max_delta_W_F1': max(deltas.values()),
        'final_loss_log_ratio': float(loss_ratio),
        'loss_curve_note': 'full-run loss curves legitimately diverge: '
                           'dropout draws + shuffle order compound on a '
                           'tiny separable store (fvt typically '
                           'converges faster here); the LOCKSTEP leg is '
                           'the per-step equivalence check',
        'lockstep': lockstep,
        'reverse_interop': {
            'max_dlogits': rev_maxd, 'argmax_agree': rev_agree,
            'ref_eval_of_fvt_weights_W_F1':
                rev_test['FRAMES_VOTE']['W_F1'],
            'fvt_W_F1': fvt_test['FRAMES_VOTE']['W_F1'],
        },
        'checks': {},
    }
    checks = result['checks']
    checks['test_wf1_within_tol'] = bool(max(deltas.values()) <= wf1_tol)
    checks['both_losses_decreased'] = bool(
        ref_losses[-1] < 0.6 * ref_losses[0]
        and fvt_losses[-1] < 0.6 * fvt_losses[0])
    checks['lockstep_exact_x64'] = bool(all(
        lockstep[mn]['max_step_loss_delta'] <= 1e-9
        and lockstep[mn]['final_eval_loss_delta'] <= 1e-9
        for mn in ('LFAN', 'CAN', 'JMT', 'MT', 'LFAN_REG')))
    checks['lockstep_f32_drift_bounded'] = bool(
        lockstep['LFAN_f32']['max_step_loss_delta'] <= 5e-3
        and lockstep['LFAN_f32']['final_eval_loss_delta'] <= 5e-3)
    checks['lockstep_frozen_backbones_fixed'] = bool(all(
        lockstep[mn]['frozen_drift_torch'] == 0.0
        and lockstep[mn]['frozen_drift_fvt'] == 0.0
        for mn in ('JMT', 'MT')))
    checks['reverse_logits_fp32'] = bool(rev_maxd < 1e-4 and rev_agree)
    checks['reverse_wf1_exact'] = bool(
        abs(rev_test['FRAMES_VOTE']['W_F1']
            - fvt_test['FRAMES_VOTE']['W_F1']) < 1e-6)
    result['ok'] = all(checks.values())

    print(json.dumps({k: v for k, v in result.items()
                      if k in ('deltas_W_F1', 'max_delta_W_F1',
                               'final_loss_log_ratio', 'reverse_interop',
                               'checks', 'ok')}, indent=2))
    if out_json:
        with open(out_json, 'w') as f:
            json.dump(result, f, indent=2)
        print(f'wrote {out_json}')
    return result


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default='/tmp/fvt_twin')
    p.add_argument('--epochs', type=int, default=5)
    p.add_argument('--lr', type=float, default=0.01)
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--out', default=None)
    a = p.parse_args()
    res = main(a.workdir, a.epochs, a.lr, a.batch, out_json=a.out)
    sys.exit(0 if res['ok'] else 1)
