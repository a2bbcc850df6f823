"""Training-step throughput harness (tri-modal LFAN, frozen backbone).

Times the jitted fused train step (forward + CE + backward + update) at
the production shape on the real device, with every step's loss forced
to host (same sync discipline as bench.py / profile_backbone.py).
Reports the XLA and, when requested, the Pallas-TCN (--pallas_train)
train paths.

Usage: python tools/profile_train.py [--batch 8] [--window 300]
                                     [--iters 8] [--pallas]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

PEAK_FLOPS = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--window', type=int, default=300)
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--pallas', action='store_true')
    ap.add_argument('--frozen_eval', action='store_true',
                    help='measure --frozen_eval_backbones (eval-mode '
                    'frozen encoders during training)')
    args = ap.parse_args()

    from fvt_tpu.utils.logger import enable_jit_cache
    enable_jit_cache()
    import jax
    import jax.numpy as jnp
    import optax
    from fvt_tpu import constants
    from fvt_tpu.models.models import LFAN
    from fvt_tpu.models.arcface import VisualBackbone
    from fvt_tpu.train.steps import create_train_state, make_train_step

    b, t = args.batch, args.window
    model = LFAN(modality=('video', 'vggish', 'bert'), output_dim=7,
                 spatial_video=VisualBackbone(dtype=jnp.bfloat16),
                 tcn_fused=args.pallas, frozen_eval=args.frozen_eval)
    rng = np.random.default_rng(0)
    batch = {
        'video': jnp.asarray(rng.integers(
            0, 255, size=(b, t, 48, 48, 3)).astype(np.uint8)),
        'vggish': jnp.asarray(rng.normal(
            size=(b, t, 128)).astype(np.float32)),
        'bert': jnp.asarray(rng.normal(
            size=(b, t, 768)).astype(np.float32)),
        constants.EXPR: jnp.asarray(rng.integers(
            0, 7, size=(b, t)).astype(np.int32)),
    }
    optimizer = optax.sgd(1e-3, momentum=0.9, nesterov=True)
    state = create_train_state(model, optimizer, batch, jax.random.key(0))

    # --pallas rides the fused TCN blocks via the model's tcn_fused flag
    # (custom-VJP kernels, models/tcn.py:38-58); the step is the same
    step = make_train_step(model, optimizer)

    key = jax.random.key(1)
    state, loss = step(state, batch, key)   # compile
    float(loss)
    state, loss = step(state, batch, key)
    float(loss)

    t0 = time.perf_counter()
    for i in range(args.iters):
        # constant key: the step folds (key, state.step) internally — a
        # host-side fold_in here would add a 67 ms dispatch round-trip
        state, loss = step(state, batch, key)
        loss_f = float(loss)  # per-step host sync
    dt = (time.perf_counter() - t0) / args.iters

    try:
        ca = step.lower(state, batch, key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca['flops'])
    except Exception:
        flops = 0.0

    print(json.dumps({
        'path': ('pallas_train' if args.pallas else 'xla')
                + ('+frozen_eval' if args.frozen_eval else ''),
        'ms_per_step': round(dt * 1e3, 1),
        'frames_per_s': round(b * t / dt, 1),
        'mfu': round(flops / dt / PEAK_FLOPS, 4) if flops else None,
        'loss': round(loss_f, 4),
        'platform': jax.default_backend(),
    }))


if __name__ == '__main__':
    main()
