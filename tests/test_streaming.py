"""Streaming (online) inference == the offline stitch, bit for bit.

`fvt_tpu/streaming.py` must reproduce, for ANY chunking of the input
stream, exactly what the offline artifact path computes
(tools/infer_artifact.py window batching + `stitch_windows_np`,
/root/reference/trainer.py:832-912 semantics), including the
only-known-at-close tail window and the short-video pad-by-repeat
bucket rule (/root/reference/base/dataset.py:570-582)."""
import os
import sys
from os.path import join
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, join(REPO, 'tools'))

from fvt_tpu import constants
from fvt_tpu.config.defaults import get_config
from fvt_tpu.data import windowing as W
from fvt_tpu.models.registry import init_model
from fvt_tpu.train.steps import make_eval_step, _device_transform
from fvt_tpu.export import (serving_input_specs, export_serving,
                            save_artifact, load_artifact)
from fvt_tpu.streaming import (StreamingSession, StreamingRegistry,
                               WindowBatcher, _conform)

WINDOW, HOP, WB = 8, 4, 4


def _tiny_args(model_name=constants.LFAN, **over):
    cfg = get_config('MELD')
    cfg.update(modality='vggish+bert+EXPR_continuous_label',
               model_name=model_name, window_length=WINDOW,
               hop_length=HOP, eval_window_batch=WB)
    cfg.update(over)
    return SimpleNamespace(**cfg)


def _init_model(args, **model_kw):
    model = init_model(args, **model_kw)
    specs = serving_input_specs(args, window_batch=1)
    inputs = _device_transform(
        {k: jnp.zeros(s.shape, s.dtype) for k, s in specs.items()},
        train=False)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False))(
            jax.random.key(0), inputs)
    return model, variables['params'], variables.get('batch_stats', {})


def _make_artifact(tmpdir, model_name=constants.LFAN, modality=None,
                   **model_kw):
    args = _tiny_args(model_name,
                      **({'modality': modality} if modality else {}))
    model, params, stats = _init_model(args, **model_kw)
    exports, aot, meta = export_serving(
        model, model_name, args, params, stats,
        shapes=[(WB, WINDOW)], platforms=('cpu',))
    path = str(join(str(tmpdir), f'{model_name}.fvtserve'))
    save_artifact(path, exports, aot, meta, params, stats)
    return args, model, params, stats, path


@pytest.fixture(scope='module')
def lfan(tmp_path_factory):
    args, model, params, stats, path = _make_artifact(
        tmp_path_factory.mktemp('stream_art'))
    return args, model, params, stats, load_artifact(path)


def _rand_stream(spec, length, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for k, s in spec.items():
        shape = (length,) + tuple(s['shape'][2:])
        if s['dtype'] == 'uint8':
            out[k] = rng.integers(0, 255, size=shape).astype(np.uint8)
        else:
            out[k] = _conform(
                rng.normal(size=shape).astype(np.float32), s['dtype'])
    return out


def _offline_stitch(art, arrs, true_len, needs_mask=False):
    """tools/infer_artifact.py dispatch for ONE video: window gather,
    fixed (wb, window) batches with tail repeat-padding, stitch."""
    mat = W.window_index_matrix(true_len, WINDOW, HOP)
    n = mat.shape[0]
    wins = {k: a[mat.reshape(-1)].reshape((n, WINDOW) + a.shape[1:])
            for k, a in arrs.items()}
    outs = None
    q = list(range(n))
    while q:
        take = q[:WB]
        del q[:WB]
        rows = take + [take[-1]] * (WB - len(take))
        inputs = {k: np.stack([wins[k][r] for r in rows]) for k in wins}
        out = np.asarray(art.call(inputs))
        if outs is None:
            outs = np.empty((n, WINDOW, out.shape[-1]), np.float32)
        for i, r in enumerate(take):
            outs[r] = out[i]
    return W.stitch_windows_np(outs, mat, true_len)


def _chunkings(length, seed):
    rng = np.random.default_rng(seed)
    whole = [length]
    ones = [1] * length
    rand = []
    left = length
    while left:
        c = int(rng.integers(1, min(left, 11) + 1))
        rand.append(c)
        left -= c
    return {'whole': whole, 'one-frame': ones, 'random': rand}


def _stream(art, arrs, chunks, mesh=None):
    sess = StreamingSession(art, mesh=mesh)
    pieces = []
    off = 0
    next_emit = 0
    for c in chunks:
        start, logits = sess.feed(
            {k: v[off:off + c] for k, v in arrs.items()})
        assert start == next_emit  # contiguous, monotone emission
        next_emit += len(logits)
        pieces.append(logits)
        off += c
    start, logits = sess.close()
    assert start == next_emit
    pieces.append(logits)
    return np.concatenate(pieces), sess


def test_streaming_matches_offline_any_chunking(lfan):
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    for length, seed in ((37, 0), (8, 1), (9, 2), (24, 3)):
        arrs = _rand_stream(spec, length, seed=seed)
        want = _offline_stitch(art, arrs, length)
        for name, chunks in _chunkings(length, seed).items():
            got, _ = _stream(art, arrs, chunks)
            assert got.shape == (length, args.num_classes)
            np.testing.assert_array_equal(got, want), (length, name)


def test_streaming_short_video_bucket_semantics(lfan):
    """L < window: ONE pad-by-repeat window, first L rows — identical
    to the live eval step on the same padded batch (the offline bucket
    path), NOT a stitch over the repeated tail."""
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 5
    arrs = _rand_stream(spec, L, seed=4)
    sess = StreamingSession(art)
    s0, first = sess.feed(arrs)
    assert s0 == 0 and len(first) == 0  # nothing final before close
    start, got = sess.close()
    assert start == 0 and got.shape == (L, args.num_classes)

    idx = W.pad_short_window_indices(L, WINDOW)
    batch = {k: np.broadcast_to(v[idx][None],
                                (WB, WINDOW) + v.shape[1:]).copy()
             for k, v in arrs.items()}
    live = np.asarray(make_eval_step(model)(params, stats, batch))
    np.testing.assert_array_equal(got, live[0, :L].astype(np.float32))


def test_streaming_empty_and_zero_length(lfan):
    *_, art = lfan
    sess = StreamingSession(art)
    start, logits = sess.close()
    assert start == 0 and logits.shape == (0, 7)
    with pytest.raises(AssertionError):
        sess.feed({})  # closed


def test_streaming_memory_stays_bounded(lfan):
    """Frame-at-a-time streaming holds at most `window` frames once
    past the first window — O(window), not O(L)."""
    *_, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 64
    arrs = _rand_stream(spec, L, seed=5)
    sess = StreamingSession(art)
    total = 0
    for t in range(L):
        _, logits = sess.feed({k: v[t:t + 1] for k, v in arrs.items()})
        total += len(logits)
        assert sess.buffered_frames <= WINDOW, (t, sess.buffered_frames)
    _, logits = sess.close()
    total += len(logits)
    assert total == L


def test_streaming_masked_model_mt(tmp_path):
    """JMT/MT (needs_mask): full windows ride the default full-length
    mask; a short close passes the true length like the bucket path."""
    import flax.linen as nn

    class TinySpatial(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            return nn.Dense(16)(x.reshape(x.shape[0], -1))

    args, model, params, stats, path = _make_artifact(
        tmp_path, constants.MT,
        modality='video+vggish+EXPR_continuous_label',
        spatial_video=TinySpatial())
    art = load_artifact(path)
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']

    length = 21
    arrs = _rand_stream(spec, length, seed=6)
    want = _offline_stitch(art, arrs, length)
    got, _ = _stream(art, arrs, _chunkings(length, 6)['random'])
    np.testing.assert_array_equal(got, want)

    L = 6
    arrs = _rand_stream(spec, L, seed=7)
    sess = StreamingSession(art)
    sess.feed(arrs)
    _, got = sess.close()
    idx = W.pad_short_window_indices(L, WINDOW)
    batch = {k: np.broadcast_to(v[idx][None],
                                (WB, WINDOW) + v.shape[1:]).copy()
             for k, v in arrs.items()}
    live = np.asarray(make_eval_step(model, needs_time_mask=True)(
        params, stats, batch, jnp.full((WB,), L, jnp.int32)))
    np.testing.assert_array_equal(got, live[0, :L].astype(np.float32))


def test_streaming_over_mesh(lfan):
    """Each window batch dispatched data-parallel (call_sharded):
    streamed output matches the single-device stream at f32 tolerance
    with identical argmaxes."""
    from fvt_tpu.parallel.mesh import make_mesh
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    length = 29
    arrs = _rand_stream(spec, length, seed=8)
    ref, _ = _stream(art, arrs, [length])
    got, _ = _stream(art, arrs, [13, 9, 7], mesh=make_mesh(4))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_dynamic_batching_packs_and_matches(lfan):
    """Four concurrent sessions sharing one WindowBatcher: windows pack
    into FULL shared dispatches (2 instead of 4 padded per-session
    batches) and every session's stitched output stays bit-identical to
    its offline path."""
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 12  # starts 0, 4; last window touches frame 11 -> no tail
    videos = [_rand_stream(spec, L, seed=10 + i) for i in range(4)]
    wants = [_offline_stitch(art, v, L) for v in videos]

    batcher = WindowBatcher(art, shared=True)
    sessions = [StreamingSession(art, batcher=batcher) for _ in range(4)]
    pieces = [[] for _ in range(4)]
    for i, (sess, vid) in enumerate(zip(sessions, videos)):
        _, logits = sess.feed(vid)
        pieces[i].append(logits)
    assert batcher.dispatches == 2 and batcher.rows_padded == 0
    for i, sess in enumerate(sessions):
        _, logits = sess.close()
        pieces[i].append(logits)
    assert batcher.dispatches == 2  # closes had nothing left to run
    for i in range(4):
        got = np.concatenate([p for p in pieces[i] if p.size])
        np.testing.assert_array_equal(got, wants[i])

    # per-session baseline: the same 4 videos cost 4 half-empty batches
    solo = StreamingSession(art)
    solo.feed(videos[0])
    solo.close()
    assert solo.batcher.dispatches == 1 and solo.batcher.rows_padded == 2


def test_dynamic_batching_over_mesh_matches(lfan):
    """Streaming x DP composition (round-4 verdict #7): the SHARED
    dynamic batcher dispatching through ``call_sharded`` on a 4-device
    mesh — cross-session packed batches, each split over the data axis —
    reproduces every session's offline stitch at f32 tolerance with
    identical argmaxes, at the same packing efficiency as the
    single-device shared path."""
    from fvt_tpu.parallel.mesh import make_mesh

    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 12
    videos = [_rand_stream(spec, L, seed=30 + i) for i in range(4)]
    wants = [_offline_stitch(art, v, L) for v in videos]

    batcher = WindowBatcher(art, shared=True, mesh=make_mesh(4))
    sessions = [StreamingSession(art, batcher=batcher) for _ in range(4)]
    pieces = [[] for _ in range(4)]
    for i, (sess, vid) in enumerate(zip(sessions, videos)):
        _, logits = sess.feed(vid)
        pieces[i].append(logits)
    assert batcher.dispatches == 2 and batcher.rows_padded == 0
    for i, sess in enumerate(sessions):
        _, logits = sess.close()
        pieces[i].append(logits)
    for i in range(4):
        got = np.concatenate([p for p in pieces[i] if p.size])
        np.testing.assert_allclose(got, wants[i], atol=2e-5, rtol=1e-5)
        np.testing.assert_array_equal(got.argmax(-1), wants[i].argmax(-1))


def test_dynamic_batch_poll_surfaces_foreign_dispatch(lfan):
    """A's windows sit in the shared queue until B's traffic fills the
    batch; A.poll() then returns A's finalized frames without feeding."""
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 12
    vid_a = _rand_stream(spec, L, seed=20)
    vid_b = _rand_stream(spec, L, seed=21)
    want_a = _offline_stitch(art, vid_a, L)

    batcher = WindowBatcher(art, shared=True)
    a = StreamingSession(art, batcher=batcher)
    b = StreamingSession(art, batcher=batcher)
    _, got = a.feed(vid_a)
    assert len(got) == 0 and batcher.dispatches == 0  # 2 of 4 queued
    start, got = a.poll()
    assert len(got) == 0
    b.feed(vid_b)  # 4th window triggers the shared dispatch
    assert batcher.dispatches == 1
    start, got = a.poll()
    # both A windows committed; frames below received-window are final
    assert start == 0 and len(got) == L - WINDOW
    np.testing.assert_array_equal(got, want_a[:L - WINDOW])
    _, tail = a.close()
    np.testing.assert_array_equal(
        np.concatenate([got, tail]), want_a)
    b.close()


def test_dynamic_batch_refuses_cross_row_models(tmp_path):
    """JMT/MT flatten (B*T) into the final attention sequence — batch
    rows MIX (models/fusion.py), so their outputs depend on batch
    composition: cross-session batching must refuse them loudly (we
    measured a 4e-2 logits delta when mixing before the gate existed).
    Per-session streaming (same batch composition as offline) keeps
    working — test_streaming_masked_model_mt pins it."""
    import flax.linen as nn

    class TinySpatial(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            return nn.Dense(16)(x.reshape(x.shape[0], -1))

    args, model, params, stats, path = _make_artifact(
        tmp_path, constants.MT,
        modality='video+vggish+EXPR_continuous_label',
        spatial_video=TinySpatial())
    art = load_artifact(path)
    with pytest.raises(AssertionError, match='mixes batch rows'):
        WindowBatcher(art, shared=True)
    with pytest.raises(AssertionError, match='mixes batch rows'):
        StreamingRegistry(art, dynamic_batch=True)
    # an unshared batcher can't be handed to sessions as if shared
    lone = WindowBatcher(art)
    with pytest.raises(AssertionError, match='shared=True'):
        StreamingSession(art, batcher=lone)


def test_registry_stale_flush_thread(lfan):
    """StreamingRegistry(dynamic_batch, max_delay_s): a partial shared
    batch is flushed by the daemon once its oldest window exceeds the
    latency bound; poll() surfaces the frames with no further traffic."""
    import time as _t
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 12
    vid = _rand_stream(spec, L, seed=40)
    want = _offline_stitch(art, vid, L)

    reg = StreamingRegistry(art, dynamic_batch=True, max_delay_s=0.05)
    try:
        sid = reg.open()
        _, got = reg.feed(sid, vid)
        assert len(got) == 0  # 2 of 4 rows queued, no dispatch yet
        deadline = _t.monotonic() + 10.0
        while _t.monotonic() < deadline:
            start, got, done = reg.poll(sid)
            if len(got):
                break
            _t.sleep(0.01)
        assert not done
        assert len(got) == L - WINDOW, 'stale flush never fired'
        assert reg.batcher.rows_padded == 2
        np.testing.assert_array_equal(got, want[:L - WINDOW])
        _, tail = reg.close(sid)
        np.testing.assert_array_equal(
            np.concatenate([got, tail]), want)
    finally:
        reg.stop()


def test_streaming_http_endpoints(tmp_path):
    """serve_http /stream/*: open -> feed chunks -> close over HTTP
    reproduces the offline stitch; bad sid is a 404."""
    import io
    import json
    import threading
    import urllib.request
    import urllib.error

    from serve_http import build_server

    args, model, params, stats, path = _make_artifact(tmp_path)
    art = load_artifact(path)
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    length = 19
    arrs = _rand_stream(spec, length, seed=9)
    want = _offline_stitch(art, arrs, length)

    srv = build_server(path, port=0, prefer_aot=False)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f'http://127.0.0.1:{srv.server_port}'
    try:
        req = urllib.request.Request(f'{base}/stream/open', data=b'',
                                     method='POST')
        with urllib.request.urlopen(req) as r:
            sid = json.loads(r.read())['sid']

        def post_npz(url, batch):
            buf = io.BytesIO()
            np.savez(buf, **batch)
            rq = urllib.request.Request(url, data=buf.getvalue(),
                                        method='POST')
            with urllib.request.urlopen(rq) as r:
                with np.load(io.BytesIO(r.read())) as z:
                    return int(z['start']), z['logits']

        pieces = []
        off = 0
        for c in (7, 11, 1):
            start, logits = post_npz(
                f'{base}/stream/{sid}/feed',
                {k: v[off:off + c] for k, v in arrs.items()})
            pieces.append(logits)
            off += c
        assert off == length
        start, logits = post_npz(f'{base}/stream/{sid}/close', {})
        pieces.append(logits)
        got = np.concatenate([p for p in pieces if p.size])
        np.testing.assert_array_equal(got, want)

        with pytest.raises(urllib.error.HTTPError) as ei:
            post_npz(f'{base}/stream/{sid}/feed',
                     {k: v[:1] for k, v in arrs.items()})
        assert ei.value.code == 404
    finally:
        srv.shutdown()


def test_http_dynamic_batch_and_poll(tmp_path):
    """serve_http --dynamic_batch: two interleaved HTTP streams share
    device batches (healthz dispatch counters prove the packing), the
    /poll endpoint surfaces frames the OTHER stream's traffic finalized,
    and both outputs equal their offline stitches bit for bit."""
    import io
    import json
    import threading
    import urllib.request

    from serve_http import build_server

    args, model, params, stats, path = _make_artifact(tmp_path)
    art = load_artifact(path)
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 12
    vid_a = _rand_stream(spec, L, seed=50)
    vid_b = _rand_stream(spec, L, seed=51)
    want_a = _offline_stitch(art, vid_a, L)
    want_b = _offline_stitch(art, vid_b, L)

    # long delay: packing must come from traffic, not the stale flusher
    srv = build_server(path, port=0, prefer_aot=False,
                       dynamic_batch=True, batch_delay_s=30.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f'http://127.0.0.1:{srv.server_port}'

    def post_npz(url, batch):
        buf = io.BytesIO()
        np.savez(buf, **batch)
        rq = urllib.request.Request(url, data=buf.getvalue(),
                                    method='POST')
        with urllib.request.urlopen(rq) as r:
            with np.load(io.BytesIO(r.read())) as z:
                return int(z['start']), z['logits']

    def get_json(url):
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    try:
        assert get_json(f'{base}/healthz')['dynamic_batch'] is True
        sids = {}
        for name in ('a', 'b'):
            rq = urllib.request.Request(f'{base}/stream/open', data=b'',
                                        method='POST')
            with urllib.request.urlopen(rq) as r:
                sids[name] = json.loads(r.read())['sid']
        _, got_a = post_npz(f'{base}/stream/{sids["a"]}/feed', vid_a)
        assert len(got_a) == 0  # 2 of 4 shared rows queued
        _, got_b = post_npz(f'{base}/stream/{sids["b"]}/feed', vid_b)
        health = get_json(f'{base}/healthz')
        assert health['stream_dispatches'] == 1
        assert health['stream_rows_padded'] == 0
        start, got_a = post_npz(f'{base}/stream/{sids["a"]}/poll', {})
        assert start == 0 and len(got_a) == L - WINDOW
        np.testing.assert_array_equal(got_a, want_a[:L - WINDOW])
        _, tail_a = post_npz(f'{base}/stream/{sids["a"]}/close', {})
        _, out_b = post_npz(f'{base}/stream/{sids["b"]}/close', {})
        np.testing.assert_array_equal(
            np.concatenate([got_a, tail_a]), want_a)
        np.testing.assert_array_equal(
            np.concatenate([got_b, out_b]) if len(got_b) else out_b,
            want_b)
    finally:
        srv.shutdown()
        srv.streams.stop()


def test_finish_packs_tails_across_sessions(lfan):
    """Two-phase close: finish() queues each stream's tail without
    flushing, so 4 finishing streams' tails share ONE full dispatch
    (close() would run 4 padded ones); outputs still bit-identical."""
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 13  # windows 0, 4 + tail 5
    videos = [_rand_stream(spec, L, seed=70 + i) for i in range(4)]
    wants = [_offline_stitch(art, v, L) for v in videos]

    batcher = WindowBatcher(art, shared=True)
    sessions = [StreamingSession(art, batcher=batcher) for _ in range(4)]
    pieces = [[] for _ in range(4)]
    for i, (sess, vid) in enumerate(zip(sessions, videos)):
        pieces[i].append(sess.feed(vid)[1])
    assert batcher.dispatches == 2  # 4x2 regular windows, packed
    for i, sess in enumerate(sessions):
        pieces[i].append(sess.finish()[1])
        with pytest.raises(AssertionError, match='finishing'):
            sess.feed({k: v[:1] for k, v in videos[i].items()})
    # the 4 tails filled one more batch the moment the last arrived —
    # whose own finish() therefore drained itself; the others drain
    # on their next poll
    assert batcher.dispatches == 3 and batcher.rows_padded == 0
    assert [s.done for s in sessions] == [False, False, False, True]
    for i, sess in enumerate(sessions):
        if not sess.done:
            pieces[i].append(sess.poll()[1])
        assert sess.done
        got = np.concatenate([p for p in pieces[i] if p.size])
        np.testing.assert_array_equal(got, wants[i])


def test_finish_short_video_and_empty(lfan):
    """finish() on a short (L < window) stream queues the pad row;
    poll() delivers the bucket-semantics result after the flush.  An
    empty stream is done immediately."""
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 5
    arrs = _rand_stream(spec, L, seed=80)
    solo = StreamingSession(art)
    solo.feed(arrs)
    _, want = solo.close()

    batcher = WindowBatcher(art, shared=True)
    sess = StreamingSession(art, batcher=batcher)
    sess.feed(arrs)
    start, first = sess.finish()
    assert len(first) == 0 and not sess.done  # queued, not dispatched
    batcher.flush()  # what the registry's stale flusher would do
    start, got = sess.poll()
    assert start == 0 and sess.done
    np.testing.assert_array_equal(got, want)

    empty = StreamingSession(art, batcher=batcher)
    _, none = empty.finish()
    assert len(none) == 0 and empty.done

    # close() after finish() still drains synchronously
    late = StreamingSession(art, batcher=batcher)
    late.feed(arrs)
    late.finish()
    start, got2 = late.close()
    np.testing.assert_array_equal(got2, want)


def test_registry_finish_flow(lfan):
    """Registry finish/poll: done flag flips once drained and the
    session is dropped; the stale flusher drives the drain."""
    import time as _t
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 13
    vid = _rand_stream(spec, L, seed=90)
    want = _offline_stitch(art, vid, L)

    reg = StreamingRegistry(art, dynamic_batch=True, max_delay_s=0.05)
    try:
        sid = reg.open()
        _, got = reg.feed(sid, vid)
        pieces = [got]
        _, got, done = reg.finish(sid)
        pieces.append(got)
        deadline = _t.monotonic() + 10.0
        while not done and _t.monotonic() < deadline:
            _, got, done = reg.poll(sid)
            pieces.append(got)
            _t.sleep(0.01)
        assert done, 'stale flush never drained the finished stream'
        np.testing.assert_array_equal(
            np.concatenate([p for p in pieces if len(p)]), want)
        with pytest.raises(KeyError):
            reg.poll(sid)  # dropped once done was observed
    finally:
        reg.stop()


def test_bench_stream_tiny_smoke(tmp_path, monkeypatch):
    """tools/bench_stream.py --tiny: runs both modes on CPU, shared
    packs strictly better (fewer dispatches, zero padded rows), and
    the JSON contract holds."""
    monkeypatch.setenv('TMPDIR', str(tmp_path))
    import bench_stream
    out = bench_stream.main(['--tiny'])
    assert out['metric'] == 'stream_serving'
    ps, sh = out['per_session'], out['shared']
    assert sh['dispatches'] < ps['dispatches']
    assert sh['rows_padded'] == 0 and ps['rows_padded'] > 0
    assert out['speedup_shared'] > 0


def test_registry_session_ttl_expiry(lfan):
    """Sessions with no requests for a full TTL are expired by the
    housekeeper (abandoned clients can't accumulate state); an active
    session keeps refreshing its clock and survives."""
    import time as _t
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    vid = _rand_stream(spec, 12, seed=100)

    reg = StreamingRegistry(art, dynamic_batch=True, max_delay_s=0.02,
                            session_ttl_s=0.15)
    try:
        dead = reg.open()
        live = reg.open()
        reg.feed(dead, vid)  # then abandoned, windows queued
        deadline = _t.monotonic() + 10.0
        while reg.expired_sessions == 0 and _t.monotonic() < deadline:
            reg.poll(live)  # keeps `live` fresh
            _t.sleep(0.02)
        assert reg.expired_sessions == 1, 'TTL expiry never fired'
        with pytest.raises(KeyError):
            reg.poll(dead)
        reg.poll(live)  # survived every sweep
        reg.close(live)
    finally:
        reg.stop()

def test_registry_concurrent_stress(lfan):
    """8 threads drive 8 streams through ONE shared-batcher registry
    while the housekeeping daemon (stale flush + TTL sweep) runs:
    random chunkings, interleaved polls, two-phase finish. Every
    stream's reassembled output must be bit-identical to the offline
    single-stream stitch — the lock discipline is what's under test
    (batcher callbacks commit into OTHER sessions' accumulators
    mid-request, exactly what a ThreadingHTTPServer produces)."""
    import threading
    import time as _t
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    lengths = [37, 8, 9, 24, 12, 5, 41, 16]
    vids = [_rand_stream(spec, L, seed=50 + i)
            for i, L in enumerate(lengths)]

    def offline(v, L):
        if L >= WINDOW:
            return _offline_stitch(art, v, L)
        # short-video pad-by-repeat bucket: one padded window, row 0
        idx = W.pad_short_window_indices(L, WINDOW)
        batch = {k: np.broadcast_to(
            a[idx][None], (WB, WINDOW) + a.shape[1:]).copy()
            for k, a in v.items()}
        return np.asarray(art.call(batch))[0, :L].astype(np.float32)

    want = [offline(v, L) for v, L in zip(vids, lengths)]

    reg = StreamingRegistry(art, dynamic_batch=True, max_delay_s=0.01,
                            session_ttl_s=60.0)
    results = [None] * len(lengths)
    errors = []

    def run(i):
        try:
            rng = np.random.default_rng(1000 + i)
            sid = reg.open()
            L = lengths[i]
            pieces = []
            off = 0
            while off < L:
                c = int(rng.integers(1, min(L - off, 7) + 1))
                s, lg = reg.feed(
                    sid, {k: v[off:off + c]
                          for k, v in vids[i].items()})
                if len(lg):
                    pieces.append((s, lg))
                off += c
                if rng.random() < 0.5:
                    s, lg, done = reg.poll(sid)
                    if len(lg):
                        pieces.append((s, lg))
            s, lg, done = reg.finish(sid)
            if len(lg):
                pieces.append((s, lg))
            deadline = _t.monotonic() + 60.0
            while not done and _t.monotonic() < deadline:
                _t.sleep(0.002)
                s, lg, done = reg.poll(sid)
                if len(lg):
                    pieces.append((s, lg))
            assert done, f'stream {i} never drained'
            out = np.full((L, want[i].shape[-1]), np.nan, np.float32)
            filled = 0
            for s, lg in pieces:
                out[s:s + len(lg)] = lg
                filled += len(lg)
            assert filled == L, (i, filled, L)
            results[i] = out
        except Exception as e:  # surface in the main thread
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(lengths))]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert not any(t.is_alive() for t in threads), 'worker hung'
    finally:
        reg.stop()
    assert not errors, errors
    assert reg.expired_sessions == 0
    for i, w in enumerate(want):
        np.testing.assert_array_equal(results[i], w)

def test_registry_max_sessions_admission(lfan, tmp_path):
    """max_sessions is the admission guard TTL can't be: opens beyond
    the cap raise CapacityError (HTTP 503), closing frees a slot, and
    rejected_sessions counts refusals (on /healthz)."""
    import json
    import threading
    import urllib.request
    import urllib.error

    from serve_http import build_server
    from fvt_tpu.streaming import CapacityError

    *_, art = lfan
    reg = StreamingRegistry(art, max_sessions=2)
    try:
        a, b = reg.open(), reg.open()
        with pytest.raises(CapacityError):
            reg.open()
        assert reg.rejected_sessions == 1
        reg.close(a)
        c = reg.open()  # freed slot admits again
        reg.close(b)
        reg.close(c)
    finally:
        reg.stop()

    # HTTP surface: third open is a 503, healthz reports the refusal
    args, model, params, stats, path = _make_artifact(
        tmp_path, model_name=constants.LFAN)
    srv = build_server(path, port=0, prefer_aot=False, max_sessions=2)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f'http://127.0.0.1:{srv.server_port}'
    try:
        def open_stream():
            rq = urllib.request.Request(f'{base}/stream/open',
                                        data=b'', method='POST')
            with urllib.request.urlopen(rq) as r:
                return json.loads(r.read())['sid']

        open_stream()
        open_stream()
        with pytest.raises(urllib.error.HTTPError) as ei:
            open_stream()
        assert ei.value.code == 503
        with urllib.request.urlopen(f'{base}/healthz') as r:
            h = json.loads(r.read())
        assert h['live_sessions'] == 2
        assert h['rejected_sessions'] == 1
    finally:
        srv.streams.stop()
        srv.shutdown()

def test_graceful_drain_on_shutdown(lfan, tmp_path):
    """drain_and_shutdown (serve_http SIGTERM/SIGINT path): new opens
    are refused with 503 while live streams finish + poll out over
    HTTP; the drain returns 0 abandoned and the server exits clean."""
    import io as _io
    import json
    import threading
    import time as _t
    import urllib.request
    import urllib.error

    from serve_http import build_server, drain_and_shutdown

    args, model, params, stats, path = _make_artifact(
        tmp_path, model_name=constants.LFAN)
    art = load_artifact(path)
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 14
    vid = _rand_stream(spec, L, seed=11)
    want = _offline_stitch(art, vid, L)

    srv = build_server(path, port=0, prefer_aot=False,
                       dynamic_batch=True, batch_delay_s=0.02)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f'http://127.0.0.1:{srv.server_port}'

    def post(p, data=b''):
        rq = urllib.request.Request(base + p, data=data, method='POST')
        try:
            with urllib.request.urlopen(rq) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    st, b = post('/stream/open')
    sid = json.loads(b)['sid']
    buf = _io.BytesIO()
    np.savez(buf, **{k: v[:9] for k, v in vid.items()})
    st, _ = post(f'/stream/{sid}/feed', buf.getvalue())
    assert st == 200

    drained = {}
    dt = threading.Thread(target=lambda: drained.update(
        left=drain_and_shutdown(srv, timeout_s=30.0)))
    dt.start()
    deadline = _t.monotonic() + 10.0
    while not srv.streams.draining and _t.monotonic() < deadline:
        _t.sleep(0.01)
    assert srv.streams.draining

    st, _ = post('/stream/open')
    assert st == 503  # draining refuses new sessions

    # the live stream still completes over HTTP during the drain
    pieces = []
    buf = _io.BytesIO()
    np.savez(buf, **{k: v[9:] for k, v in vid.items()})
    st, b = post(f'/stream/{sid}/feed', buf.getvalue())
    assert st == 200
    with np.load(_io.BytesIO(b)) as z:
        pieces.append((int(z['start']), z['logits']))
    done = False
    st, b = post(f'/stream/{sid}/finish')
    assert st == 200
    with np.load(_io.BytesIO(b)) as z:
        pieces.append((int(z['start']), z['logits']))
        done = bool(z['done'])
    deadline = _t.monotonic() + 30.0
    while not done and _t.monotonic() < deadline:
        _t.sleep(0.01)
        st, b = post(f'/stream/{sid}/poll')
        if st != 200:
            break
        with np.load(_io.BytesIO(b)) as z:
            pieces.append((int(z['start']), z['logits']))
            done = bool(z['done'])
    assert done

    out = np.full((L, want.shape[-1]), np.nan, np.float32)
    for s, lg in pieces:
        if len(lg):
            out[s:s + len(lg)] = lg
    np.testing.assert_array_equal(out, want)

    dt.join(timeout=60)
    assert not dt.is_alive()
    assert drained['left'] == 0  # clean drain, nothing abandoned
    with pytest.raises(urllib.error.URLError):
        urllib.request.urlopen(f'{base}/healthz', timeout=2)

def test_serving_client_library(tmp_path):
    """fvt_tpu/client.py against a live server: offline logits match a
    direct artifact call; chunked stream() is bit-identical to the
    offline stitch; 503 -> ServerBusy, stale sid -> SessionGone."""
    import threading

    from serve_http import build_server, drain_and_shutdown
    from fvt_tpu.client import (ServingClient, ServerBusy, SessionGone)

    args, model, params, stats, path = _make_artifact(tmp_path)
    art = load_artifact(path)
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 21
    vid = _rand_stream(spec, L, seed=13)
    want = _offline_stitch(art, vid, L)

    srv = build_server(path, port=0, prefer_aot=False,
                       dynamic_batch=True, batch_delay_s=0.02,
                       max_sessions=3)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    c = ServingClient(f'http://127.0.0.1:{srv.server_port}')
    try:
        h = c.healthz()
        assert h['ok'] and h['dynamic_batch']
        assert c.meta()['model_name'] == args.model_name

        # offline one-shot: same windowed batch as the artifact call
        mat = W.window_index_matrix(L, WINDOW, HOP)
        rows = list(range(mat.shape[0])) + [mat.shape[0] - 1] * (
            WB - mat.shape[0] % WB) if mat.shape[0] % WB else list(
            range(mat.shape[0]))
        batch = {k: v[mat[rows[:WB]].reshape(-1)].reshape(
            (WB, WINDOW) + v.shape[1:]) for k, v in vid.items()}
        np.testing.assert_array_equal(
            c.logits(batch), np.asarray(art.call(batch)))

        # streaming convenience loop == offline stitch, bit for bit
        got = c.stream(vid, chunk=5)
        np.testing.assert_array_equal(got, want)

        # manual handle flow
        s = c.open_stream()
        s.feed(vid)
        s.finish()
        np.testing.assert_array_equal(s.result(), want)
        with pytest.raises(SessionGone):
            s.poll()  # drained sessions are dropped server-side

        # admission refusals surface as ServerBusy
        held = [c.open_stream() for _ in range(3)]
        with pytest.raises(ServerBusy):
            c.open_stream()
        for s in held:
            s.close()
    finally:
        drain_and_shutdown(srv, timeout_s=5.0)

    # a drained-for-shutdown server refuses opens the same way
    with pytest.raises((ServerBusy, OSError)):
        c.open_stream()

@pytest.mark.parametrize('length', [5, 14])
def test_finish_completes_without_shared_batcher(lfan, length):
    """finish() on a PRIVATE batcher (no --dynamic_batch) must flush
    immediately: no cross-stream traffic will ever pack the tail rows
    and nothing else flushes a private queue — before the fix, `done`
    never flipped and clients polled forever."""
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    vid = _rand_stream(spec, length, seed=length)
    if length >= WINDOW:
        want = _offline_stitch(art, vid, length)
    else:
        idx = W.pad_short_window_indices(length, WINDOW)
        batch = {k: np.broadcast_to(
            v[idx][None], (WB, WINDOW) + v.shape[1:]).copy()
            for k, v in vid.items()}
        want = np.asarray(art.call(batch))[0, :length].astype(
            np.float32)

    reg = StreamingRegistry(art)  # NO dynamic batching, no housekeeper
    try:
        sid = reg.open()
        pieces = []
        s, lg = reg.feed(sid, vid)
        if len(lg):
            pieces.append((s, lg))
        s, lg, done = reg.finish(sid)
        if len(lg):
            pieces.append((s, lg))
        assert done, 'finish on a private batcher must drain in-call'
        out = np.full((length, want.shape[-1]), np.nan, np.float32)
        for s, lg in pieces:
            out[s:s + len(lg)] = lg
        np.testing.assert_array_equal(out, want)
        with pytest.raises(KeyError):
            reg.poll(sid)  # drained session already dropped
    finally:
        reg.stop()

def test_private_batcher_stale_flush_bounds_latency(lfan):
    """Without dynamic batching, --batch_delay_ms still bounds
    mid-stream latency: parked partial private queues are flushed by
    the housekeeper, so frames finalize without waiting for a full
    window batch (before: unbounded until wb windows accumulated)."""
    import time as _t
    args, model, params, stats, art = lfan
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 12  # windows at 0 and 4: both complete, queue 2 < wb=4
    vid = _rand_stream(spec, L, seed=21)
    want = _offline_stitch(art, vid, L)

    reg = StreamingRegistry(art, max_delay_s=0.05)
    try:
        sid = reg.open()
        s, lg = reg.feed(sid, vid)
        assert len(lg) == 0  # both windows parked in the private queue
        deadline = _t.monotonic() + 10.0
        got = None
        while _t.monotonic() < deadline:
            _t.sleep(0.02)
            s, lg, done = reg.poll(sid)
            if len(lg):
                got = (s, lg)
                break
        assert got is not None, 'stale flush never freed the frames'
        s, lg = got
        assert s == 0 and len(lg) == 4  # received-window bound
        np.testing.assert_array_equal(lg, want[:4])
        _, tail, done = reg.finish(sid)
        assert done
        np.testing.assert_array_equal(
            np.concatenate([lg, tail]), want)
    finally:
        reg.stop()

def test_masked_model_exempt_from_private_stale_flush(tmp_path):
    """A timing-triggered early flush would repeat-pad a masked model's
    (JMT/MT) partial batch differently from the offline grouping — and
    their rows attend ACROSS the batch, so logits would become
    timing-dependent. The housekeeper must skip their private batchers;
    outputs stay bit-identical to the offline stitch, finalized only on
    full batches / finish."""
    import time as _t
    import flax.linen as nn

    class TinySpatial(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            return nn.Dense(16)(x.reshape(x.shape[0], -1))

    args, model, params, stats, path = _make_artifact(
        tmp_path, constants.MT,
        modality='video+vggish+EXPR_continuous_label',
        spatial_video=TinySpatial())
    art = load_artifact(path)
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    L = 12  # 2 complete windows parked: a flushable partial queue
    vid = _rand_stream(spec, L, seed=31)
    want = _offline_stitch(art, vid, L)

    reg = StreamingRegistry(art, max_delay_s=0.03)
    try:
        sid = reg.open()
        _, lg = reg.feed(sid, vid)
        assert len(lg) == 0
        _t.sleep(0.3)  # many housekeeping ticks
        s, lg, done = reg.poll(sid)
        assert len(lg) == 0, 'masked model was stale-flushed early'
        s, lg, done = reg.finish(sid)
        assert done
        np.testing.assert_array_equal(lg, want)
    finally:
        reg.stop()


def test_dynamic_batch_requires_latency_bound(tmp_path):
    """serve_http refuses --dynamic_batch --batch_delay_ms 0 at parse
    time: with no stale-flush bound, a lone stream's finish()ed tail is
    dispatched only by OTHER streams' traffic, so a quiet server would
    leave clients polling forever (and each poll refreshes the TTL)."""
    from serve_http import main as serve_main
    with pytest.raises(SystemExit):
        serve_main(['--artifact', 'x.fvtserve', '--dynamic_batch',
                    '--batch_delay_ms', '0'])

def test_healthz_latency_stats(tmp_path):
    """/healthz reports per-endpoint request-latency percentiles from a
    bounded recent-window ring (observability for serving operators)."""
    import threading

    from serve_http import build_server, drain_and_shutdown, LatencyStats
    from fvt_tpu.client import ServingClient

    # unit: ring bounds memory, count keeps totals
    st = LatencyStats()
    for i in range(300):
        st.record('/x', 0.001 * (i + 1))
    snap = st.snapshot()['/x']
    assert snap['count'] == 300
    assert snap['max_ms'] == 300.0
    assert snap['p50_ms'] >= 0.001 * (300 - LatencyStats.RING) * 1e3

    args, model, params, stats, path = _make_artifact(tmp_path)
    art = load_artifact(path)
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    srv = build_server(path, port=0, prefer_aot=False)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    c = ServingClient(f'http://127.0.0.1:{srv.server_port}')
    try:
        c.stream(_rand_stream(spec, 12, seed=1), chunk=4)
        lat = c.healthz()['latency']
        assert lat['/stream/open']['count'] == 1
        assert lat['/stream/feed']['count'] == 3
        assert lat['/stream/finish']['count'] == 1
        for ep, row in lat.items():
            assert 0 <= row['p50_ms'] <= row['p95_ms'] <= row['max_ms']
    finally:
        drain_and_shutdown(srv, timeout_s=5.0)

def test_metrics_endpoint_prometheus_format(tmp_path):
    """GET /metrics: the healthz counters in Prometheus text format."""
    import threading
    import urllib.request

    from serve_http import build_server, drain_and_shutdown
    from fvt_tpu.client import ServingClient

    args, model, params, stats, path = _make_artifact(tmp_path)
    art = load_artifact(path)
    spec = art.meta['shapes'][art.shape_keys[0]]['inputs']
    srv = build_server(path, port=0, prefer_aot=False,
                       dynamic_batch=True, batch_delay_s=0.02)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f'http://127.0.0.1:{srv.server_port}'
    c = ServingClient(base)
    try:
        c.stream(_rand_stream(spec, 12, seed=8), chunk=4)
        with urllib.request.urlopen(f'{base}/metrics') as r:
            assert r.headers['Content-Type'].startswith('text/plain')
            text = r.read().decode()
        assert 'fvt_live_sessions 0' in text
        assert 'fvt_stream_dispatches_total' in text
        assert 'fvt_request_count_total{endpoint="/stream/feed"} 3' \
            in text
        assert 'quantile="0.95"' in text
    finally:
        drain_and_shutdown(srv, timeout_s=5.0)
