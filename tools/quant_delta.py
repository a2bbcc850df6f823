"""Quality-delta harness for --serve_quant int8 / int8_static (VERDICT r2 #3).

Measures, on the bench's synthetic 256^2 challenge store with a
torch-ported ArcFace backbone (the only checkpoint source in this image
— pretrained_models/ of the reference holds no weights):

  1. per-frame logit delta between the bf16 serving path and the int8
     path (max / mean abs, over every video of the store);
  2. frame argmax agreement (the quantity F1 is computed from);
  3. frame- and video-level W-F1 of both paths against the store's
     synthetic labels, and the delta.

``--trained`` (VERDICT r3 #5) first TRAINS a tri-modal LFAN on a
synthetic raw-video store (heads learn through the frozen backbone,
exactly the reference's training contract, trainer.py:399-430), then
measures the same deltas by serving that checkpoint bf16 vs int8 via
``Experiment.run_eval`` — so the bound describes how backbone
quantization error propagates through TRAINED heads and the
training-updated BN running stats, not through random-init heads.
(The backbone weights themselves are frozen at init in BOTH cases:
the published res50_ir_0.887.pth exists in neither this image nor the
reference repo — tools/preflight.py validates the day it appears.)

Run on the TPU:  python tools/quant_delta.py [--trained]
Results are recorded in DESIGN.md ("int8 serving" section).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))


def ported_backbone_stats():
    """(params, batch_stats) ported from a torch VisualBackbone with the
    reference init — the same machinery test_backbone_parity.py pins."""
    sys.path.insert(0, '/root/reference')
    import torch
    from models.backbone import VisualBackbone as TorchVB
    from fvt_tpu.models.arcface import visual_backbone_from_torch

    torch.manual_seed(0)
    tvb = TorchVB(use_pretrained=False, mode='ir')
    tvb.eval()
    return visual_backbone_from_torch(tvb.state_dict())


def run_inference(serve_quant: str, store_root: str):
    from fvt_tpu import constants
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment

    outd = tempfile.mkdtemp(prefix=f'fvt_qd_{serve_quant}_')
    cfg = get_config(constants.C_EXPR_DB_CHALLENGE)
    cfg.update(dataset_path=store_root,
               folds_dir=os.path.join(store_root, 'folds',
                                      constants.C_EXPR_DB_CHALLENGE),
               modality='video+vggish+bert+EXPR_continuous_label',
               amp=True, serve_quant=serve_quant,
               window_length=300, hop_length=200,
               eval_bucket_quantum=100, eval_video_batch=32,
               num_workers=8, calc_mean_std=True, outd=outd)
    args = SimpleNamespace(**cfg)
    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))

    # graft the SAME torch-ported backbone weights into both paths so
    # the delta is purely the quantization
    vparams, vstats = ported_backbone_stats()
    params = dict(trainer.state.params)
    params['spatial_video'] = vparams
    stats = dict(trainer.state.batch_stats)
    stats['spatial_video'] = vstats
    trainer.state = trainer.state.replace(params=params,
                                          batch_stats=stats)

    if serve_quant == 'int8_static':
        # calibrate AFTER the ported weights are live (same contract as
        # experiment.run_eval): scales describe the served checkpoint
        trainer.calibrate_quant(exp._sample_batch(loaders))

    perf, logits = trainer.inference(loaders[constants.TESTSET])
    return perf, logits


def wf1(perf):
    from fvt_tpu import constants
    return perf[None][constants.W_F1][constants.FRAME_LEVEL]['master']


# ------------------------------------------------------- --trained mode
TRAIN_CFG = dict(window_length=20, hop_length=10, eval_bucket_quantum=20)


def train_trimodal(workdir: str):
    """Train a tri-modal LFAN (frozen backbone, trained heads — the
    reference training contract) on a synthetic raw-video MELD store;
    returns (store, best_model_path)."""
    from synth_store import make_meld_store
    from fvt_tpu.main import main as train_main

    store = make_meld_store(os.path.join(workdir, 'store'), n_train=12,
                            n_val=4, n_test=6, min_len=20, max_len=40,
                            with_video=True)
    outd = os.path.join(workdir, 'run')
    train_main([
        '--dataset_name', 'MELD',
        '--dataset_path', store['dataset_path'],
        '--folds_dir', store['folds_dir'],
        '--modality', 'video+vggish+bert+EXPR_continuous_label',
        '--model_name', 'LFAN',
        '--num_epochs', '2',
        '--train_batch_size', '4',
        '--num_workers', '2',
        '--window_length', str(TRAIN_CFG['window_length']),
        '--hop_length', str(TRAIN_CFG['hop_length']),
        '--eval_bucket_quantum', str(TRAIN_CFG['eval_bucket_quantum']),
        '--outd', outd,
    ])
    best = os.path.join(outd, 'best-models')
    case = sorted(os.listdir(best))[0]
    return store, os.path.join(best, case, 'model.msgpack')


def run_eval_trained(serve_quant: str, store: dict, path_model: str):
    """Serve the trained checkpoint on the store's test split under the
    given quantization mode (Experiment.run_eval: load -> calibrate ->
    inference, the same path inference_challenge.py drives)."""
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment

    outd = tempfile.mkdtemp(prefix=f'fvt_qd_trained_{serve_quant}_')
    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='video+vggish+bert+EXPR_continuous_label',
               model_name='LFAN', amp=True, serve_quant=serve_quant,
               num_workers=2, outd=outd, **TRAIN_CFG)
    exp = Experiment(SimpleNamespace(**cfg))
    exp.prepare()
    return exp.run_eval(path_model=path_model)


def _delta_report(run_fn, extra: dict) -> dict:
    """bf16 reference pass + per-mode delta/agreement/W-F1 table — ONE
    implementation for both the random-init and --trained entry points
    (they differ only in which closure produces (perf, per-video logits))."""
    perf_bf16, log_bf16 = run_fn('none')
    out = dict(extra)
    out.update({
        'logit_scale': float(np.abs(np.concatenate(
            [log_bf16[v]['logits'].reshape(-1) for v in log_bf16])).mean()),
        'wf1_bf16': float(wf1(perf_bf16)),
    })
    for mode in ('int8', 'int8_static'):
        perf_q, log_q = run_fn(mode)
        deltas, agrees, n = [], [], 0
        for vid in log_bf16:
            a = log_bf16[vid]['logits']
            b = log_q[vid]['logits']
            deltas.append(np.abs(a - b))
            agrees.append((a.argmax(-1) == b.argmax(-1)).mean())
            n += len(a)
        d = np.concatenate([x.reshape(-1) for x in deltas])
        out['frames'] = n
        out.update({
            f'logit_abs_delta_max_{mode}': float(d.max()),
            f'logit_abs_delta_mean_{mode}': float(d.mean()),
            f'frame_argmax_agreement_{mode}': float(np.mean(agrees)),
            f'wf1_{mode}': float(wf1(perf_q)),
            f'wf1_delta_{mode}': float(wf1(perf_q) - wf1(perf_bf16)),
        })
    print(json.dumps(out, indent=2))
    return out


def main_trained():
    workdir = tempfile.mkdtemp(prefix='fvt_qd_train_')
    print(f'== quant_delta --trained: training tri-modal LFAN '
          f'({workdir}) ==', flush=True)
    store, path_model = train_trimodal(workdir)
    return _delta_report(
        lambda mode: run_eval_trained(mode, store, path_model),
        {'checkpoint': 'tri-modal LFAN, 2 epochs on a synthetic '
                       'raw-video store (trained heads + frozen '
                       'backbone with training-updated BN stats)'})


def main():
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    import bench

    store = bench._make_store()
    return _delta_report(lambda mode: run_inference(mode, store), {})


if __name__ == '__main__':
    if '--trained' in sys.argv:
        main_trained()
    else:
        main()
