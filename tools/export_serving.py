#!/usr/bin/env python
"""Export a trained run's serving step as a frozen artifact.

Counterpart to the reference's deployment flow (reload the checkpoint
inside the full training stack per process,
/root/reference/inference_challenge.py + experiment.py:242-269): this
produces ONE file (see fvt_tpu/export.py for the format) holding the
already-traced StableHLO serving program (multi-platform), the weights,
and optionally an AOT-compiled executable for this host's backend — so
a serving fleet loads it with no model code, no tracing, and (AOT) no
compile.

Usage:
  python tools/export_serving.py --fd_exp <training-run-dir> \
      [--case_best_model <item>] [--out artifact.fvtserve] \
      [--window_batch 48 [--window_batch 16 ...]] [--seq_len T ...] \
      [--platforms cpu,tpu] [--aot]

Needs only the run dir (frozen config.yml + best-models/*/model.msgpack)
— no feature store, EXCEPT for ``--serve_quant int8_static`` runs:
their activation scales are calibrated against live data
(fvt_tpu/experiment.py:243-246), so the export calibrates one
representative batch from the run's dataset_path (override with
``--calib_store``) and SERIALIZES the scales into the artifact — the
frozen serving program then carries them as baked constants and
deployment hosts need no store (round-4 verdict #3; the scales are ~41
numbers).
"""
import argparse
import json
import os
import sys
from os.path import join
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def load_run_config(fd_exp: str) -> SimpleNamespace:
    import yaml
    with open(join(fd_exp, 'config.yml')) as f:
        cfg = yaml.safe_load(f)
    return SimpleNamespace(**cfg)


def build_model_and_weights(args, path_model: str):
    """Model + (params, batch_stats) loaded from a best-model msgpack,
    with shapes templated from the config alone (no store needed)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization as fser
    from fvt_tpu.experiment import Experiment
    from fvt_tpu.models.registry import init_model
    from fvt_tpu.train.steps import _device_transform
    from fvt_tpu.export import serving_input_specs

    spatial_video, spatial_audio = Experiment(args)._spatial_modules()
    model = init_model(args, spatial_video=spatial_video,
                       spatial_audio=spatial_audio)

    specs = serving_input_specs(args, window_batch=1)
    inputs = {k: jnp.zeros(s.shape, s.dtype) for k, s in specs.items()}
    inputs = _device_transform(inputs, train=False)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False))(
            jax.random.key(0), inputs)
    tpl = {'params': variables['params'],
           'batch_stats': variables.get('batch_stats', {})}
    with open(path_model, 'rb') as f:
        data = fser.from_bytes(tpl, f.read())
    return model, data['params'], data['batch_stats']


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--fd_exp', required=True,
                   help='finished training run dir (config.yml + '
                        'best-models/)')
    p.add_argument('--case_best_model', default=None)
    p.add_argument('--out', default=None,
                   help='artifact path (default <fd_exp>/serving.fvtserve)')
    p.add_argument('--window_batch', type=int, action='append',
                   default=None,
                   help='pooled window-batch size(s) to export '
                        '(default: the run\'s eval_window_batch)')
    p.add_argument('--seq_len', type=int, action='append', default=None,
                   help='per-window frame count(s) (default: the run\'s '
                        'window_length)')
    p.add_argument('--platforms', default='cpu,tpu')
    p.add_argument('--aot', action='store_true',
                   help='also AOT-compile for THIS host\'s backend and '
                        'embed the executable (zero-compile load on an '
                        'identical platform + jax version)')
    p.add_argument('--calib_store', default=None,
                   help='int8_static only: dataset_path holding the '
                        'calibration store (default: the run\'s '
                        'dataset_path)')
    p.add_argument('--calib_folds_dir', default=None,
                   help='int8_static only: folds_dir for the '
                        'calibration store (default: the run\'s)')
    a = p.parse_args(argv)

    from fvt_tpu.export import export_serving, save_artifact
    from fvt_tpu.utils.logger import log

    args = load_run_config(a.fd_exp)
    int8_static = getattr(args, 'serve_quant', 'none') == 'int8_static'
    if int8_static:
        if a.calib_store:
            args.dataset_path = a.calib_store
        if a.calib_folds_dir:
            args.folds_dir = a.calib_folds_dir
        if not os.path.isdir(str(args.dataset_path)):
            raise SystemExit(
                f'int8_static export needs a calibration store: the '
                f'activation scales describe live data '
                f'(experiment.py:243-246) and {args.dataset_path!r} '
                f'does not exist — pass --calib_store/--calib_folds_dir')

    case = a.case_best_model
    best_dir = join(a.fd_exp, 'best-models')
    if case is None:
        cases = sorted(os.listdir(best_dir))
        assert cases, best_dir
        case = cases[0]
    path_model = join(best_dir, case, 'model.msgpack')
    assert os.path.isfile(path_model), path_model

    model, params, batch_stats = build_model_and_weights(args, path_model)

    extra_vars = None
    if int8_static:
        # calibrate against the LOADED weights (the scales must describe
        # the served checkpoint's activations) on one representative
        # batch from the store — exactly the live path's semantics
        # (Experiment.run_eval -> Trainer.calibrate_quant)
        from fvt_tpu.experiment import Experiment
        from fvt_tpu.ops.quant import calibrate_act_scales
        import jax
        exp = Experiment(args)
        exp.prepare()
        sample = exp._sample_batch(exp.init_loaders())
        scales = calibrate_act_scales(model, params, batch_stats, sample)
        extra_vars = {'act_scales': scales}
        log(f"int8_static: calibrated "
            f"{len(jax.tree.leaves(scales))} activation scales from "
            f"{args.dataset_path}")

    wbs = a.window_batch or [int(getattr(args, 'eval_window_batch', 8))]
    tls = a.seq_len or [int(args.window_length)]
    shapes = [(wb, t) for wb in wbs for t in tls]
    platforms = [s.strip() for s in a.platforms.split(',') if s.strip()]

    exports, aot_blobs, meta = export_serving(
        model, args.model_name, args, params, batch_stats,
        shapes=shapes, platforms=platforms, aot=a.aot,
        extra_vars=extra_vars)
    meta['source_run'] = os.path.abspath(a.fd_exp)
    meta['case_best_model'] = case

    out = a.out or join(a.fd_exp, 'serving.fvtserve')
    save_artifact(out, exports, aot_blobs, meta, params, batch_stats,
                  extra_vars=extra_vars)
    log(f"wrote {out}: shapes={sorted(meta['shapes'])} "
        f"platforms={platforms} aot={sorted(aot_blobs) or None} "
        f"({os.path.getsize(out) / 1e6:.1f} MB)")
    print(json.dumps({'artifact': out, 'shapes': sorted(meta['shapes']),
                      'platforms': platforms,
                      'aot': sorted(aot_blobs)}))


if __name__ == '__main__':
    main()
