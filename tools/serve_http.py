#!/usr/bin/env python
"""Minimal production serving endpoint over a frozen .fvtserve artifact.

Demonstrates the deployment story fvt_tpu/export.py exists for: a
serving host runs THIS file + the artifact — no training stack, no
model code, no checkpoint surgery (the reference re-hosts its full
stack per serving process, /root/reference/inference_challenge.py).
Stdlib-only (http.server); one process, synchronous dispatch — put a
real load balancer in front for fleets.

  python tools/serve_http.py --artifact run/serving.fvtserve \
      [--host 127.0.0.1] [--port 8700] [--no_aot] [--mesh N]

``--mesh N`` serves data-parallel over an N-device 'data' mesh
(ServingArtifact.call_sharded: batch sharded, weights replicated, XLA
partitions the exported program; N=0/absent = single-device).  The
exported window_batch must divide by N.

Protocol:
  GET  /healthz       -> {"ok": true, "shapes": [...], "aot": bool,
                          "mesh": N, session/batching counters, drain
                          state, per-endpoint latency percentiles}
  GET  /metrics       -> the same counters in Prometheus text format
  GET  /meta          -> the artifact's meta.json
  POST /logits        -> body: npz (numpy savez) with one array per
                         modality [+ optional 'length' (B,) int32 for
                         masked models]; response: npz {'logits': (B,T,C)}.
                         Batch shape must match an exported shape
                         (route errors come back as 400 with the
                         available shapes).

Streaming (online sliding-window inference, fvt_tpu/streaming.py —
per-frame logits finalize as soon as no future window can cover them,
bit-identical to the offline stitch):
  POST /stream/open        -> {"sid": "..."}
  POST /stream/<sid>/feed  -> body: npz, one (n, ...) array per
                              modality (any chunk length, 1 frame up);
                              response: npz {'start': i, 'logits':
                              (m, C)} — the frames finalized so far.
  POST /stream/<sid>/poll  -> empty body; same response shape plus a
                              'done' flag — frames finalized since the
                              last feed/poll (under --dynamic_batch
                              another stream's dispatch or the stale
                              flush may have finalized them between
                              this client's requests).
  POST /stream/<sid>/finish-> two-phase close: queues the tail WITHOUT
                              flushing, so finishing streams' tails
                              pack with other traffic (poll until
                              'done'; the stale flush bounds the wait).
  POST /stream/<sid>/close -> synchronous: flushes the tail window;
                              same response; the session is gone
                              afterwards (404).

``--dynamic_batch`` packs ready windows from ALL live streams into
shared full window_batch dispatches (bit-identical outputs, fuller MXU
batches under many concurrent low-rate streams); ``--batch_delay_ms``
bounds the wait before a partial batch is flushed (default 50).
``--session_ttl_s`` expires streaming sessions that made no request
for that long (default 3600; 0 = never) so abandoned streams can't
accumulate server state; ``--max_sessions`` refuses ``/stream/open``
with 503 beyond that many live sessions (admission guard against
open floods).  SIGTERM/SIGINT trigger a graceful drain: new opens are
refused while live streams finish and poll out, bounded by
``--drain_timeout_s``.
"""
import argparse
import io
import json
import os
import signal
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


class LatencyStats:
    """Per-endpoint request-latency aggregation for /healthz.

    Thread-safe (the server handles requests on many threads); keeps a
    bounded ring of recent durations per endpoint so the percentiles
    track the CURRENT regime, not the process lifetime."""

    RING = 256

    def __init__(self):
        self._lock = threading.Lock()
        self._by_ep = {}  # endpoint -> (count, ring list)

    def record(self, endpoint: str, seconds: float) -> None:
        with self._lock:
            count, ring = self._by_ep.get(endpoint, (0, []))
            ring.append(seconds)
            if len(ring) > self.RING:
                del ring[:len(ring) - self.RING]
            self._by_ep[endpoint] = (count + 1, ring)

    def snapshot(self) -> dict:
        with self._lock:
            out = {}
            for ep, (count, ring) in self._by_ep.items():
                r = sorted(ring)
                out[ep] = {
                    'count': count,
                    'p50_ms': round(r[len(r) // 2] * 1e3, 3),
                    'p95_ms': round(r[min(len(r) - 1,
                                          int(len(r) * 0.95))] * 1e3, 3),
                    'max_ms': round(r[-1] * 1e3, 3),
                }
            return out


def make_handler(art, mesh=None, dynamic_batch=False,
                 batch_delay_s=0.05, session_ttl_s=3600.0,
                 max_sessions=0):
    from fvt_tpu.streaming import CapacityError, StreamingRegistry
    streams = StreamingRegistry(art, mesh=mesh,
                                dynamic_batch=dynamic_batch,
                                max_delay_s=batch_delay_s,
                                session_ttl_s=session_ttl_s,
                                max_sessions=max_sessions)

    latency = LatencyStats()

    def dispatch(arrays, length=None):
        if mesh is not None:
            return art.call_sharded(arrays, mesh=mesh, length=length)
        return art.call(arrays, length=length)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload, ctype='application/json'):
            body = payload if isinstance(payload, bytes) \
                else json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _metrics_text(self) -> str:
            b = streams.batcher
            lines = [
                '# fvt_tpu serving metrics (Prometheus text format)',
                f'fvt_live_sessions {streams.live_sessions}',
                f'fvt_expired_sessions_total {streams.expired_sessions}',
                f'fvt_rejected_sessions_total '
                f'{streams.rejected_sessions}',
                f'fvt_draining {int(streams.draining)}',
            ]
            if b is not None:
                lines += [
                    f'fvt_stream_dispatches_total {b.dispatches}',
                    f'fvt_stream_rows_padded_total {b.rows_padded}',
                ]
            for ep, row in latency.snapshot().items():
                lab = f'{{endpoint="{ep}"}}'
                lines += [
                    f'fvt_request_count_total{lab} {row["count"]}',
                    f'fvt_request_latency_ms{{endpoint="{ep}",'
                    f'quantile="0.5"}} {row["p50_ms"]}',
                    f'fvt_request_latency_ms{{endpoint="{ep}",'
                    f'quantile="0.95"}} {row["p95_ms"]}',
                ]
            return '\n'.join(lines) + '\n'

        def do_GET(self):
            if self.path == '/metrics':
                self._send(200, self._metrics_text().encode(),
                           ctype='text/plain; version=0.0.4')
            elif self.path == '/healthz':
                b = streams.batcher
                self._send(200, {'ok': True, 'shapes': art.shape_keys,
                                 'aot': bool(art._aot),
                                 'mesh': (mesh.devices.size
                                          if mesh is not None else 0),
                                 'dynamic_batch': b is not None,
                                 'stream_dispatches':
                                     b.dispatches if b else None,
                                 'stream_rows_padded':
                                     b.rows_padded if b else None,
                                 'live_sessions':
                                     streams.live_sessions,
                                 'expired_sessions':
                                     streams.expired_sessions,
                                 'rejected_sessions':
                                     streams.rejected_sessions,
                                 'draining': streams.draining,
                                 'latency': latency.snapshot()})
            elif self.path == '/meta':
                self._send(200, art.meta)
            else:
                self._send(404, {'error': f'unknown path {self.path}'})

        def _send_stream(self, start, logits, done=None):
            buf = io.BytesIO()
            extra = {} if done is None else {'done': np.bool_(done)}
            np.savez(buf, start=np.int64(start),
                     logits=np.asarray(logits, np.float32), **extra)
            self._send(200, buf.getvalue(),
                       ctype='application/octet-stream')

        def do_POST(self):
            t0 = time.monotonic()
            try:
                self._do_post()
            finally:
                parts = self.path.strip('/').split('/')
                ep = (f'/stream/{parts[2]}' if len(parts) == 3
                      and parts[0] == 'stream' else self.path)
                latency.record(ep, time.monotonic() - t0)

        def _do_post(self):
            n = int(self.headers.get('Content-Length', 0))
            body = self.rfile.read(n)
            parts = self.path.strip('/').split('/')
            try:
                if self.path == '/logits':
                    with np.load(io.BytesIO(body)) as z:
                        arrays = {k: z[k] for k in z.files}
                    length = arrays.pop('length', None)
                    out = np.asarray(dispatch(arrays, length=length))
                    buf = io.BytesIO()
                    np.savez(buf, logits=out)
                    self._send(200, buf.getvalue(),
                               ctype='application/octet-stream')
                elif self.path == '/stream/open':
                    try:
                        self._send(200, {'sid': streams.open()})
                    except CapacityError as e:
                        self._send(503, {'error': str(e)})
                elif (len(parts) == 3 and parts[0] == 'stream'
                        and parts[2] in ('feed', 'poll', 'finish',
                                         'close')):
                    sid = parts[1]
                    done = None
                    try:
                        if parts[2] == 'feed':
                            with np.load(io.BytesIO(body)) as z:
                                frames = {k: z[k] for k in z.files}
                            start, logits = streams.feed(sid, frames)
                        elif parts[2] == 'poll':
                            start, logits, done = streams.poll(sid)
                        elif parts[2] == 'finish':
                            start, logits, done = streams.finish(sid)
                        else:
                            start, logits = streams.close(sid)
                            done = True
                    except KeyError:
                        self._send(404, {'error': f'no session {sid!r}'})
                        return
                    self._send_stream(start, logits, done=done)
                else:
                    self._send(404,
                               {'error': f'unknown path {self.path}'})
            except (KeyError, AssertionError) as e:
                # shape miss, batch indivisible by the mesh, or a
                # malformed stream chunk
                self._send(400, {'error': str(e),
                                 'shapes': art.shape_keys})
            except Exception as e:  # malformed body etc.
                self._send(400, {'error': f'{type(e).__name__}: {e}'})

        def log_message(self, fmt, *a):  # quiet by default
            if os.environ.get('FVT_SERVE_VERBOSE'):
                super().log_message(fmt, *a)

    Handler.streams = streams
    Handler.latency = latency
    return Handler


def build_server(artifact: str, host: str = '127.0.0.1', port: int = 0,
                 prefer_aot: bool = True, mesh_devices: int = 0,
                 dynamic_batch: bool = False, batch_delay_s: float = 0.05,
                 session_ttl_s: float = 3600.0,
                 max_sessions: int = 0) -> ThreadingHTTPServer:
    from fvt_tpu.export import load_artifact
    art = load_artifact(artifact, prefer_aot=prefer_aot)
    mesh = None
    if mesh_devices:
        from fvt_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(mesh_devices)
    # warm every shape once so first real request pays no backend compile
    for key in art.shape_keys:
        spec = art.meta['shapes'][key]['inputs']
        batch = {k: np.zeros(v['shape'], v['dtype'])
                 for k, v in spec.items()}
        np.asarray(art.call_sharded(batch, mesh=mesh) if mesh is not None
                   else art.call(batch))
    handler = make_handler(art, mesh=mesh, dynamic_batch=dynamic_batch,
                           batch_delay_s=batch_delay_s,
                           session_ttl_s=session_ttl_s,
                           max_sessions=max_sessions)
    srv = ThreadingHTTPServer((host, port), handler)
    srv.streams = handler.streams  # expose for shutdown/stats
    return srv


def drain_and_shutdown(srv, timeout_s: float = 30.0,
                       poll_s: float = 0.1) -> int:
    """Graceful shutdown: refuse new stream opens (503) while live
    streams keep feeding/finishing/polling, wait until none remain (or
    ``timeout_s``), then tear the server down.  Returns the number of
    sessions abandoned at the deadline (0 = clean drain)."""
    live = srv.streams.drain()
    print(f'draining: {live} live sessions, opens now refused',
          flush=True)
    deadline = time.monotonic() + timeout_s
    while srv.streams.live_sessions and time.monotonic() < deadline:
        time.sleep(poll_s)
    left = srv.streams.live_sessions
    srv.shutdown()
    srv.server_close()  # release the listening socket (refuse, not hang)
    srv.streams.stop()
    if left:
        print(f'drain deadline hit: {left} sessions abandoned',
              flush=True)
    return left


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--artifact', required=True)
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8700)
    p.add_argument('--no_aot', action='store_true')
    p.add_argument('--mesh', type=int, default=0,
                   help='serve data-parallel over an N-device mesh '
                        '(0 = single device)')
    p.add_argument('--dynamic_batch', action='store_true',
                   help='pack windows from ALL live streams into '
                        'shared full window_batch dispatches')
    p.add_argument('--batch_delay_ms', type=float, default=50.0,
                   help='max wait before a partial window batch is '
                        'flushed — the shared queue under '
                        '--dynamic_batch, or each stream\'s private '
                        'batcher otherwise (streaming latency bound)')
    p.add_argument('--session_ttl_s', type=float, default=3600.0,
                   help='expire streaming sessions idle this long '
                        '(0 = never)')
    p.add_argument('--max_sessions', type=int, default=0,
                   help='refuse /stream/open (503) beyond this many '
                        'live sessions (0 = unlimited)')
    p.add_argument('--drain_timeout_s', type=float, default=30.0,
                   help='on SIGTERM/SIGINT: refuse new opens and wait '
                        'this long for live streams to finish before '
                        'exiting')
    p.add_argument('--force_cpu', action='store_true',
                   help='pin jax to the CPU backend before first use '
                        '(needed to serve a cpu-only artifact on a '
                        'host whose TPU PJRT plugin would otherwise '
                        'win — JAX_PLATFORMS=cpu is IGNORED when such '
                        'a plugin is importable)')
    a = p.parse_args(argv)
    if a.force_cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if a.dynamic_batch and a.batch_delay_ms <= 0:
        p.error('--dynamic_batch needs --batch_delay_ms > 0: with no '
                'stale-flush bound, a lone stream\'s finish()ed tail '
                'is only dispatched by other streams\' traffic, so a '
                'quiet server would leave clients polling forever')
    srv = build_server(a.artifact, a.host, a.port,
                       prefer_aot=not a.no_aot, mesh_devices=a.mesh,
                       dynamic_batch=a.dynamic_batch,
                       batch_delay_s=a.batch_delay_ms / 1000.0,
                       session_ttl_s=a.session_ttl_s,
                       max_sessions=a.max_sessions)
    print(f"serving {a.artifact} on http://{a.host}:{srv.server_port} "
          f"(shapes warmed)", flush=True)
    stop = threading.Event()

    def on_signal(signum, frame):
        if stop.is_set():
            # second signal while draining: force-quit (default action)
            signal.signal(signum, signal.SIG_DFL)
            signal.raise_signal(signum)
        stop.set()

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, on_signal)
    server_thread = threading.Thread(target=srv.serve_forever,
                                     daemon=True)
    server_thread.start()
    stop.wait()
    drain_and_shutdown(srv, timeout_s=a.drain_timeout_s)
    server_thread.join(timeout=10)


if __name__ == '__main__':
    main()
