"""Backbone throughput harness: ArcFace ResNet-50 conv-path variants.

Times, in ONE harness (same sync discipline: every step forces a result
slice to host — on axon, block_until_ready alone can elide unconsumed
dispatches), the full frozen-backbone forward at the serving shape
(B*T = n_frames of 40x40 crops, bf16) for each conv implementation:

    xla              direct lax convolutions (r01 production path)
    winograd         F(2x2,3x3) transform-domain matmuls, XLA ops
    winograd_pallas  fused-VMEM Winograd Pallas kernel

plus an optional per-stage conv microbench (--stages) over the four
body-stage shapes.  Prints one JSON line with ms/step, frames/s and MFU
per variant.

Usage:  python tools/profile_backbone.py [--frames 2400] [--iters 10]
                                         [--stages] [--fp32]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

PEAK_FLOPS = 197e12  # v5e bf16


def _time(fn, *args, iters=10, warmup=2):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        np.asarray(out.reshape(-1)[:1])
        out = fn(*args)
    np.asarray(out.reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(out.reshape(-1)[:1])
    return (time.perf_counter() - t0) / iters


def _flops_of(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca['flops'])
    except Exception:
        return 0.0


def bench_backbone(n_frames: int, iters: int, dtype_name: str):
    import jax
    import jax.numpy as jnp
    from fvt_tpu.models.arcface import VisualBackbone

    dtype = jnp.bfloat16 if dtype_name == 'bf16' else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_frames, 40, 40, 3))
                    .astype(np.float32))

    results = {}
    variables = None
    ref_out = None
    for impl in ('xla', 'int8', 'int8_static', 'fused', 'winograd',
                 'winograd_pallas'):
        if impl == 'fused':
            # fused_blocks=True is the point of this row: the default
            # False made it silently measure the plain XLA chain again
            from fvt_tpu.models.arcface import arcface_forward_eval
            fwd = jax.jit(lambda v, xx: arcface_forward_eval(
                v['params'], v['batch_stats'], xx, dtype=dtype,
                fused_blocks=True))
        elif impl == 'int8_static':
            # calibrate once (untimed) on a slice, then serve with the
            # scales closed over — drops the per-conv max|x| passes
            model = VisualBackbone(dtype=dtype, conv_impl='int8')
            _, mut = jax.jit(lambda v, xx, m=model: m.apply(
                v, xx, train=False, mutable=['act_scales']))(
                    variables, x[:256])
            scales = mut['act_scales']
            fwd = jax.jit(
                lambda v, xx, m=model, s=scales: m.apply(
                    {**v, 'act_scales': s}, xx, train=False))
        else:
            model = VisualBackbone(dtype=dtype, conv_impl=impl)
            if variables is None:
                variables = jax.jit(
                    lambda r, v: model.init(r, v, train=False))(
                        jax.random.key(0), x[:8])
            fwd = jax.jit(
                lambda v, xx, m=model: m.apply(v, xx, train=False))
        flops = _flops_of(fwd, variables, x)
        try:
            dt = _time(fwd, variables, x, iters=iters)
        except Exception as e:  # keep the harness alive per-variant
            results[impl] = {'error': repr(e)[:200]}
            continue
        out = np.asarray(fwd(variables, x))
        if impl == 'xla':
            ref_out = out
            max_err = 0.0
        elif ref_out is not None:
            max_err = float(np.max(np.abs(out - ref_out)))
        else:
            max_err = None  # xla reference unavailable
        results[impl] = {
            'ms': round(dt * 1e3, 3),
            'frames_per_s': round(n_frames / dt, 1),
            'mfu': round(flops / dt / PEAK_FLOPS, 4) if flops else None,
            'gflops_model': round(flops / 1e9, 1),
            'max_abs_err_vs_xla': (round(max_err, 6)
                                   if max_err is not None
                                   else None),
        }
    return results


def bench_stages(n_frames: int, iters: int, dtype_name: str,
                 chain: int = 16):
    """Chains ``chain`` same-shape convs inside ONE jit so the per-call
    tunnel-sync floor (~15-40 ms on axon) is amortized away."""
    import jax
    import jax.numpy as jnp
    from fvt_tpu.ops.winograd import (conv3x3_winograd,
                                      conv3x3_winograd_pallas)

    dtype = jnp.bfloat16 if dtype_name == 'bf16' else jnp.float32
    stages = [(40, 64), (20, 128), (10, 256), (5, 512)]
    rng = np.random.default_rng(1)

    def chained(conv):
        def fn(x, k):
            y = x
            for _ in range(chain):
                y = conv(y, k)
                # keep magnitudes bounded; NOTE: XLA fuses this scale
                # into the conv epilogue but it stays a separate
                # elementwise pass after the opaque Pallas kernel (~2%
                # penalty on the pallas rows of the table)
                y = 0.09 * y
            return y
        return jax.jit(fn)

    def direct_conv(a, b):
        return jax.lax.conv_general_dilated(
            a, b, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    out = {}
    for h, c in stages:
        x = jnp.asarray(rng.normal(size=(n_frames, h, h, c))
                        .astype(np.float32)).astype(dtype)
        k = jnp.asarray((rng.normal(size=(3, 3, c, c)) * 0.12)
                        .astype(np.float32)).astype(dtype)
        flops = 2 * 9 * n_frames * h * h * c * c * chain
        row = {}
        for name, conv in (('direct', direct_conv),
                           ('winograd', conv3x3_winograd),
                           ('winograd_pallas', conv3x3_winograd_pallas)):
            try:
                dt = _time(chained(conv), x, k, iters=iters)
                row[name] = {
                    'ms_per_conv': round(dt * 1e3 / chain, 3),
                    'eff_mfu': round(flops / dt / PEAK_FLOPS, 4)}
            except Exception as e:
                row[name] = {'error': repr(e)[:200]}
        out[f'{h}x{h}x{c}'] = row
    return out


def bench_bottleneck(n_frames: int, iters: int, dtype_name: str,
                     chain: int = 8):
    """Whole-BottleneckIR block: XLA op-chain vs the fused Pallas block
    (ops/bottleneck_pallas.py), ``chain`` blocks inside one jit so the
    tunnel sync floor is amortized.  The VERDICT-r2 epilogue-fusion
    experiment."""
    import jax
    import jax.numpy as jnp
    from fvt_tpu.models.arcface import BottleneckIR
    from fvt_tpu.ops.bottleneck_pallas import bottleneck_ir_fused

    dtype = jnp.bfloat16 if dtype_name == 'bf16' else jnp.float32
    stages = [(40, 64), (20, 128), (10, 256), (5, 512)]
    rng = np.random.default_rng(2)

    out = {}
    for h, c in stages:
        # keep the REAL per-stage load: the backbone runs all n_frames
        # through every stage (pixel count shrinks 4x per stage while
        # channels double, so bytes halve) — do not subsample frames or
        # the fixed overheads dominate and the stage looks memory-idle
        n = n_frames
        x = jnp.asarray(rng.normal(size=(n, h, h, c))
                        .astype(np.float32)).astype(dtype)
        block = BottleneckIR(in_channel=c, depth=c, stride=1, dtype=dtype)
        variables = block.init(jax.random.key(0), x[:2], train=False)

        def xla_chain(v, xx):
            y = xx
            for _ in range(chain):
                y = block.apply(v, y, train=False)
            return y

        from fvt_tpu.ops.bottleneck_pallas import safe_batch_tile
        want = max(4, min(64, (8 * 40 * 40 * 64) // (h * h * c)))
        tile = safe_batch_tile(n, h, h, c,
                               2 if dtype_name == 'bf16' else 4, want)

        def fused_chain(v, xx):
            y = xx
            for _ in range(chain):
                y = bottleneck_ir_fused(y, v['params'],
                                        v['batch_stats'],
                                        batch_tile=tile)
            return y

        flops = 2 * 2 * 9 * n * h * h * c * c * chain
        row = {'frames': n, 'tile': tile, 'requested_tile': want}
        variants = [('xla', xla_chain)]
        if tile:
            variants.append(('fused', fused_chain))
        else:
            row['fused'] = {'skipped': 'no VMEM-safe tile at this '
                            'shape (kernel would fall back to XLA)'}
        for name, fn in variants:
            jfn = jax.jit(fn)
            try:
                dt = _time(jfn, variables, x, iters=iters)
                row[name] = {
                    'ms_per_block': round(dt * 1e3 / chain, 3),
                    'eff_mfu': round(flops / dt / PEAK_FLOPS, 4)}
            except Exception as e:
                row[name] = {'error': repr(e)[:300]}
        if 'ms_per_block' in row.get('xla', {}) and \
                'ms_per_block' in row.get('fused', {}):
            row['speedup'] = round(row['xla']['ms_per_block']
                                   / row['fused']['ms_per_block'], 3)
            # parity at this shape (bf16 noise scale)
            a = np.asarray(jax.jit(xla_chain)(variables, x),
                           dtype=np.float32)
            b = np.asarray(jax.jit(fused_chain)(variables, x),
                           dtype=np.float32)
            row['rel_err'] = round(
                float(np.abs(a - b).max() / np.abs(a).max()), 6)
        out[f'{h}x{h}x{c}'] = row
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=2400)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--stages', action='store_true')
    ap.add_argument('--bottleneck', action='store_true')
    ap.add_argument('--fp32', action='store_true')
    args = ap.parse_args()

    from fvt_tpu.utils.logger import enable_jit_cache
    enable_jit_cache()
    import jax
    dtype = 'fp32' if args.fp32 else 'bf16'
    report = {'platform': jax.default_backend(), 'frames': args.frames,
              'dtype': dtype}
    if args.stages:
        report['stages'] = bench_stages(args.frames, args.iters, dtype)
    elif args.bottleneck:
        report['bottleneck'] = bench_bottleneck(args.frames, args.iters,
                                                dtype)
    else:
        report['backbone'] = bench_backbone(args.frames, args.iters, dtype)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
