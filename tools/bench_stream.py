#!/usr/bin/env python
"""Streaming-serving throughput: dynamic cross-session batching vs
per-session batches, against one frozen artifact on THIS backend.

Simulates N concurrent live streams (hop-sized chunks fed round-robin
— the worst realistic case for batch occupancy: every stream produces
windows slowly) and measures the SAME traffic two ways:

  per_session   each stream fills (or repeat-pads) its own
                window_batch — the naive serving shape
  shared        one WindowBatcher packs ready windows from all
                streams into full dispatches (fvt_tpu/streaming.py,
                serve_http --dynamic_batch); outputs bit-identical

The win has two components, both reported: fewer device dispatches
(each costs a sync round-trip — 15-25 ms fixed on the axon tunnel) and
zero pad-row upload/compute (pad rows are real H2D bytes and real MXU
work).  Timing is honest: every dispatch materializes its logits on
the host (`np.asarray` inside WindowBatcher._dispatch) before the
clock stops, and one full-batch warmup runs first so compile time is
excluded.

Usage:
  python tools/bench_stream.py [--streams 8] [--frames 900]
      [--chunk 200] [--artifact path.fvtserve] [--tiny] [--json out]

Without --artifact a random-init LFAN (vggish+bert, bf16 feature H2D —
the serving default) is exported in-process for cpu+tpu.  --tiny runs
the CPU-sized smoke shape the tests use.
"""
import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_artifact(tmpdir: str, window: int, hop: int, wb: int,
                   platforms) -> str:
    import jax
    import jax.numpy as jnp
    from fvt_tpu import constants
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.models.registry import init_model
    from fvt_tpu.train.steps import _device_transform
    from fvt_tpu.export import (serving_input_specs, export_serving,
                                save_artifact)

    cfg = get_config('MELD')
    cfg.update(modality='vggish+bert+EXPR_continuous_label',
               model_name=constants.LFAN, window_length=window,
               hop_length=hop, eval_window_batch=wb,
               h2d_bf16_features=True)
    args = SimpleNamespace(**cfg)
    model = init_model(args)
    specs = serving_input_specs(args, window_batch=1)
    inputs = _device_transform(
        {k: jnp.zeros(s.shape, s.dtype) for k, s in specs.items()},
        train=False)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), inputs)
    exports, aot, meta = export_serving(
        model, constants.LFAN, args, variables['params'],
        variables.get('batch_stats', {}), shapes=[(wb, window)],
        platforms=platforms)
    path = os.path.join(tmpdir, 'bench_stream.fvtserve')
    save_artifact(path, exports, aot, meta, variables['params'],
                  variables.get('batch_stats', {}))
    return path


def make_streams(spec, n_streams: int, frames: int, seed: int = 0):
    from fvt_tpu.streaming import _conform
    rng = np.random.default_rng(seed)
    vids = []
    for _ in range(n_streams):
        v = {}
        for k, s in spec.items():
            shape = (frames,) + tuple(s['shape'][2:])
            if s['dtype'] == 'uint8':
                v[k] = rng.integers(0, 255, size=shape).astype(np.uint8)
            else:
                v[k] = _conform(
                    rng.normal(size=shape).astype(np.float32),
                    s['dtype'])
        vids.append(v)
    return vids


def run_mode(art, vids, chunk: int, shared: bool):
    """Round-robin feed all streams in `chunk`-frame pieces, then end
    them the way each mode is meant to be used: per-session streams
    close() synchronously (a private batcher has no other traffic to
    wait for); shared streams finish() so their tails pack together,
    with ONE flush standing in for the registry's stale flusher, then
    poll() to drain.  Returns (wall_s, dispatches, rows_padded,
    frames_emitted)."""
    from fvt_tpu.streaming import StreamingSession, WindowBatcher

    frames = len(next(iter(vids[0].values())))
    batcher = WindowBatcher(art, shared=True) if shared else None
    sessions = [StreamingSession(art, batcher=batcher) for _ in vids]
    emitted = 0
    t0 = time.perf_counter()
    for off in range(0, frames, chunk):
        for sess, vid in zip(sessions, vids):
            _, logits = sess.feed(
                {k: v[off:off + chunk] for k, v in vid.items()})
            emitted += len(logits)
    if shared:
        for sess in sessions:
            _, logits = sess.finish()
            emitted += len(logits)
        batcher.flush()
        for sess in sessions:
            if not sess.done:
                _, logits = sess.poll()
                emitted += len(logits)
            assert sess.done
    else:
        for sess in sessions:
            _, logits = sess.close()
            emitted += len(logits)
    wall = time.perf_counter() - t0
    if shared:
        disp, padded = batcher.dispatches, batcher.rows_padded
    else:
        disp = sum(s.batcher.dispatches for s in sessions)
        padded = sum(s.batcher.rows_padded for s in sessions)
    assert emitted == frames * len(vids), (emitted, frames, len(vids))
    return wall, disp, padded, emitted


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--artifact', default=None)
    p.add_argument('--streams', type=int, default=8)
    p.add_argument('--frames', type=int, default=900)
    p.add_argument('--chunk', type=int, default=200,
                   help='frames per feed (default: one hop)')
    p.add_argument('--window', type=int, default=300)
    p.add_argument('--hop', type=int, default=200)
    p.add_argument('--window_batch', type=int, default=8)
    p.add_argument('--tiny', action='store_true',
                   help='CPU smoke shape (window 8 / hop 4 / wb 4)')
    p.add_argument('--json', default=None,
                   help='also write the result line to this file')
    a = p.parse_args(argv)
    if a.tiny:
        a.window, a.hop, a.window_batch = 8, 4, 4
        a.frames, a.chunk, a.streams = 24, 4, 4

    import jax
    from fvt_tpu.export import load_artifact

    backend = jax.default_backend()
    path = a.artifact or build_artifact(
        os.environ.get('TMPDIR', '/tmp'), a.window, a.hop,
        a.window_batch, platforms=('cpu', 'tpu'))
    art = load_artifact(path, prefer_aot=False)
    key = art.shape_keys[0]
    spec = art.meta['shapes'][key]['inputs']
    wb = art.meta['shapes'][key]['window_batch']

    # warm: one full-batch dispatch so neither mode pays the compile
    warm = {k: np.zeros(v['shape'], v['dtype']) for k, v in spec.items()}
    np.asarray(art.call(warm))

    vids = make_streams(spec, a.streams, a.frames)
    results = {}
    for mode, shared in (('per_session', False), ('shared', True)):
        wall, disp, padded, emitted = run_mode(art, vids, a.chunk, shared)
        results[mode] = {
            'wall_s': round(wall, 4),
            'frames_per_s': round(emitted / wall, 1),
            'dispatches': disp,
            'rows_padded': padded,
        }
    out = {
        'metric': 'stream_serving',
        'backend': backend,
        'streams': a.streams, 'frames': a.frames, 'chunk': a.chunk,
        'window': art.meta['window_length'],
        'hop': art.meta['hop_length'], 'window_batch': wb,
        **results,
        'speedup_shared': round(results['per_session']['wall_s']
                                / results['shared']['wall_s'], 3),
    }
    line = json.dumps(out)
    print(line, flush=True)
    if a.json:
        with open(a.json, 'w') as f:
            f.write(line + '\n')
    return out


if __name__ == '__main__':
    main()
