#!/usr/bin/env python
"""Measure what a frozen serving artifact saves on THIS backend.

Three cold-start paths to first logits at one shape, each in a fresh
timing scope (the persistent jit cache is disabled here on purpose —
this tool measures the no-cache cold start a brand-new serving host
pays; utils.logger.enable_jit_cache is the in-fleet mitigation the
artifact makes unnecessary):

  stack_cold   build model from config + load msgpack + jit trace +
               backend compile + first call   (the reference's model:
               /root/reference/inference_challenge.py re-hosts the full
               stack per process)
  portable     load .fvtserve export (no model code, no trace) +
               backend compile + first call
  aot          load .fvtserve AOT executable + first call (zero compile;
               only when backend kind + jax version match the artifact)

Usage:
  python tools/bench_artifact.py --fd_exp <run-dir> \
      [--artifact <path>] [--window_batch 4]

Prints one JSON line with seconds per path.  Run on the serving
platform: CPU numbers de-risk the harness; the TPU numbers are the
claim (first compile per shape is 20-120 s there, CLAUDE.md).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _first_logits_sync(out):
    import numpy as np
    np.asarray(out[:1, :1])


def time_stack_cold(fd_exp: str, wb: int) -> float:
    """Full training-stack rebuild, as the reference does per process."""
    import numpy as np
    from export_serving import load_run_config, build_model_and_weights
    from fvt_tpu.export import serving_input_specs, build_serving_fn

    t0 = time.perf_counter()
    args = load_run_config(fd_exp)
    case = sorted(os.listdir(os.path.join(fd_exp, 'best-models')))[0]
    path_model = os.path.join(fd_exp, 'best-models', case, 'model.msgpack')
    model, params, stats = build_model_and_weights(args, path_model)
    fn, needs_mask = build_serving_fn(model, args.model_name, args)
    specs = serving_input_specs(args, wb)
    rng = np.random.default_rng(0)
    batch = {k: (rng.integers(0, 255, size=s.shape).astype(np.uint8)
                 if s.dtype == np.uint8 else
                 rng.normal(size=s.shape).astype(np.float32)
                 .astype(s.dtype)) for k, s in specs.items()}
    call = (fn(params, stats, batch,
               np.full((wb,), args.window_length, np.int32))
            if needs_mask else fn(params, stats, batch))
    _first_logits_sync(call)
    return time.perf_counter() - t0


def time_artifact(path: str, prefer_aot: bool, steady_iters: int = 8):
    """Returns (cold_s, aot_used, steady_s): cold load-to-first-logits,
    then the per-call steady state (weights device-resident from load,
    only the batch ships per call)."""
    import numpy as np
    from fvt_tpu.export import load_artifact

    t0 = time.perf_counter()
    art = load_artifact(path, prefer_aot=prefer_aot)
    key = art.shape_keys[0]
    spec = art.meta['shapes'][key]['inputs']
    rng = np.random.default_rng(0)
    batch = {k: (rng.integers(0, 255, size=v['shape']).astype(np.uint8)
                 if v['dtype'] == 'uint8' else
                 rng.normal(size=v['shape']).astype(np.float32)
                 .astype(v['dtype'])) for k, v in spec.items()}
    _first_logits_sync(np.asarray(art.call(batch)))
    dt = time.perf_counter() - t0
    t1 = time.perf_counter()
    for _ in range(steady_iters):
        _first_logits_sync(np.asarray(art.call(batch)))
    steady = (time.perf_counter() - t1) / steady_iters
    return dt, bool(art._aot) and not art.aot_fallbacks, steady


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--fd_exp', required=True)
    p.add_argument('--artifact', default=None,
                   help='default <fd_exp>/serving.fvtserve')
    p.add_argument('--window_batch', type=int, default=None,
                   help='for the stack_cold leg (default: the '
                        'artifact\'s first shape)')
    a = p.parse_args(argv)

    import jax
    art_path = a.artifact or os.path.join(a.fd_exp, 'serving.fvtserve')
    from fvt_tpu.export import load_artifact
    meta = load_artifact(art_path, prefer_aot=False).meta
    wb = a.window_batch or next(iter(meta['shapes'].values()))[
        'window_batch']

    # order matters: each leg's FIRST run in this process is the cold
    # one; later legs reuse nothing (different programs/paths) except
    # jax/library imports, which all legs share via this warmup
    jax.numpy.zeros(1).block_until_ready()

    aot_s, aot_used, aot_steady = time_artifact(art_path, prefer_aot=True)
    portable_s, _, portable_steady = time_artifact(art_path,
                                                   prefer_aot=False)
    stack_s = time_stack_cold(a.fd_exp, wb)

    print(json.dumps({
        'backend': jax.default_backend(),
        'shape': sorted(meta['shapes'])[0],
        'aot_s': round(aot_s, 3) if aot_used else None,
        'aot_used': aot_used,
        'aot_steady_s': round(aot_steady, 4) if aot_used else None,
        'portable_s': round(portable_s, 3),
        'portable_steady_s': round(portable_steady, 4),
        'stack_cold_s': round(stack_s, 3),
        'note': ('aot skips backend compile; portable skips model '
                 'build/trace; stack_cold is the reference-style '
                 'per-process rebuild (no persistent jit cache); '
                 '*_steady_s is per-call after warm-up with '
                 'device-resident weights'),
    }))


if __name__ == '__main__':
    main()
