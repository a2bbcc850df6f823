"""Online (streaming) sliding-window inference over serving artifacts.

The reference stack is strictly offline: it windows a COMPLETE video
(/root/reference/trainer.py:894-912), forwards every window, and
stitches with a Counter average (/root/reference/trainer.py:832-892).
`StreamingSession` produces the SAME per-frame logits while frames
arrive incrementally — the production shape for live emotion
recognition, which the reference cannot express at all.

Contract (pinned by tests/test_streaming.py): for any chunking of the
input — one frame at a time included — the concatenated streamed
output is BIT-IDENTICAL to the offline path through the same artifact
(`tools/infer_artifact.py` semantics, itself pinned against
`Trainer.inference`):

  * long videos (L >= window): `stitch_windows_np` over the reference
    windowing rule (starts 0, hop, 2*hop, ... plus the tail window
    [L-window, L) — data/windowing.py:22-30);
  * short videos (L < window): the padded bucket path — one
    pad-by-repeat window (data/windowing.py:111-121), first L rows.

Finalization math.  The tail window's start (L - window) is unknown
until the stream closes, but any not-yet-run window — regular or tail —
must start at ``>= received - window`` (a regular start s is only
deferred while s + window > received; the tail starts at
L - window >= received - window).  Hence every frame
``t < received - window`` can never gain another covering window: its
average is FINAL and is emitted immediately.  The same bound lets the
session trim its frame buffer to the last ``window`` frames plus any
not-yet-windowed suffix, so memory is O(window + feed chunk), not O(L).

Bitwise equality holds because (a) eval-mode window forwards are
row-independent (no cross-batch reduction: BatchNorm runs on running
stats), so a window's logits do not depend on which rows share its
batch, and (b) windows are committed into the float32 scatter-sum in
ascending start order — the exact addition order of the offline
``np.add.at`` — and the count division happens once, at finalization.
"""
from __future__ import annotations

import threading
import uuid
from typing import Dict, List, Optional, Tuple

import numpy as np

from fvt_tpu.data import windowing as W


def _conform(arr: np.ndarray, dtype_name: str) -> np.ndarray:
    if dtype_name == 'bfloat16':
        import ml_dtypes
        want = np.dtype(ml_dtypes.bfloat16)
    else:
        want = np.dtype(dtype_name)
    return arr if arr.dtype == want else arr.astype(want)


class StreamingSession:
    """Incremental sliding-window inference bound to one ServingArtifact.

    >>> sess = StreamingSession(art)
    >>> start, logits = sess.feed({'vggish': chunk_v, 'bert': chunk_b})
    >>> ...                       # (start, (n, C)) finalized frames
    >>> start, logits = sess.close()   # flushes the tail

    ``feed`` accepts per-modality arrays of IDENTICAL leading length
    (the chunk's frame count; any length >= 0) and returns the frames
    whose stitched logits became final.  Dispatches ride the artifact's
    exported ``(window_batch, window)`` shape; ready windows are queued
    and sent once ``window_batch`` accumulate (``close`` flushes a
    partial batch with repeat-padding, like tools/infer_artifact.py).
    Pass ``mesh=`` to dispatch each batch data-parallel via
    ``ServingArtifact.call_sharded``.
    """

    def __init__(self, art, *, window: Optional[int] = None,
                 hop: Optional[int] = None, mesh=None):
        self.art = art
        self.mesh = mesh
        meta = art.meta
        self.window = int(window or meta['window_length'])
        self.hop = int(hop or meta['hop_length'])
        assert self.window > 0 and self.hop > 0, (self.window, self.hop)
        key = next((k for k, v in meta['shapes'].items()
                    if v['seq_len'] == self.window), None)
        assert key is not None, (
            f"artifact has no export at seq_len == window "
            f"({self.window}); available: {list(meta['shapes'])}")
        self.shape_key = key
        self.spec = meta['shapes'][key]['inputs']
        self.wb = int(meta['shapes'][key]['window_batch'])
        self.num_classes = int(meta['num_classes'])
        self.needs_mask = bool(meta.get('needs_mask'))

        self.received = 0          # total frames fed so far
        self.next_start = 0        # next regular window start to extract
        self.emitted = 0           # frames already finalized + returned
        self.closed = False
        # frame buffers: one contiguous array per modality holding
        # frames [base, received)
        self._base = 0
        self._buf: Dict[str, np.ndarray] = {}
        # extracted-but-not-dispatched windows: (start, {mod: (W,...)})
        self._queue: List[Tuple[int, Dict[str, np.ndarray]]] = []
        # stitch accumulators for frames [emitted, ...)
        self._summed = np.zeros((0, self.num_classes), np.float32)
        self._counts = np.zeros((0,), np.float32)

    # -- internals ----------------------------------------------------

    def _grow_accum(self, upto: int) -> None:
        need = upto - self.emitted
        if need > len(self._counts):
            pad = need - len(self._counts)
            self._summed = np.concatenate(
                [self._summed, np.zeros((pad, self.num_classes),
                                        np.float32)])
            self._counts = np.concatenate(
                [self._counts, np.zeros((pad,), np.float32)])

    def _commit(self, start: int, out: np.ndarray) -> None:
        """Scatter one window's logits (float32, ascending-start order —
        the offline np.add.at addition order)."""
        self._grow_accum(start + self.window)
        o = start - self.emitted
        self._summed[o:o + self.window] += out.astype(np.float32)
        self._counts[o:o + self.window] += 1.0

    def _dispatch(self, flush: bool = False) -> None:
        while len(self._queue) >= self.wb or (flush and self._queue):
            take = self._queue[:self.wb]
            del self._queue[:self.wb]
            rows = take + [take[-1]] * (self.wb - len(take))
            inputs = {k: np.stack([r[1][k] for r in rows])
                      for k in rows[0][1]}
            out = np.asarray(self._call(inputs))
            for i, (start, _) in enumerate(take):
                self._commit(start, out[i])

    def _call(self, inputs, length=None):
        if self.mesh is not None:
            return self.art.call_sharded(inputs, mesh=self.mesh,
                                         length=length)
        return self.art.call(inputs, length=length)

    def _extract_ready(self) -> None:
        while self.next_start + self.window <= self.received:
            s = self.next_start
            o = s - self._base
            win = {k: np.ascontiguousarray(v[o:o + self.window])
                   for k, v in self._buf.items()}
            self._queue.append((s, win))
            self.next_start += self.hop
        # frames below BOTH the next regular start and the earliest
        # possible tail start (received - window) are never read again
        keep_from = min(self.next_start,
                        max(0, self.received - self.window))
        if keep_from > self._base:
            cut = keep_from - self._base
            self._buf = {k: v[cut:] for k, v in self._buf.items()}
            self._base = keep_from

    def _emit(self, upto: int) -> Tuple[int, np.ndarray]:
        """Finalize frames [emitted, upto): divide by counts, pop."""
        n = upto - self.emitted
        if n <= 0:
            return self.emitted, np.zeros((0, self.num_classes),
                                          np.float32)
        self._grow_accum(upto)
        # zero-coverage frames (hop > window configs) stay 0 like the
        # reference's Counter division — same guard as stitch_windows_np
        logits = (self._summed[:n]
                  / np.maximum(self._counts[:n], 1.0)[:, None])
        start = self.emitted
        self._summed = self._summed[n:]
        self._counts = self._counts[n:]
        self.emitted = upto
        return start, logits

    # -- public API ---------------------------------------------------

    @property
    def buffered_frames(self) -> int:
        """Frames currently held (memory bound: O(window + chunk))."""
        return self.received - self._base

    def feed(self, frames: Dict[str, np.ndarray]
             ) -> Tuple[int, np.ndarray]:
        """Append a chunk; returns (start_index, (n, C) logits) of the
        frames finalized by this chunk (n may be 0)."""
        assert not self.closed, 'session is closed'
        assert frames, 'empty modality dict'
        lens = {k: len(v) for k, v in frames.items()}
        assert len(set(lens.values())) == 1, (
            f"modalities disagree on chunk length: {lens}")
        want = set(self.spec)
        assert set(frames) == want, (
            f"expected modalities {sorted(want)}, got {sorted(frames)}")
        n = next(iter(lens.values()))
        for k, v in frames.items():
            tail = tuple(self.spec[k]['shape'][2:])
            assert tuple(v.shape[1:]) == tail, (
                f"{k}: per-frame shape {v.shape[1:]} != spec {tail}")
        if n:
            for k, v in frames.items():
                v = _conform(np.asarray(v), self.spec[k]['dtype'])
                self._buf[k] = (np.concatenate([self._buf[k], v])
                                if k in self._buf and len(self._buf[k])
                                else np.ascontiguousarray(v))
            self.received += n
        self._extract_ready()
        self._dispatch()
        # safe bound: no future window can start below received-window,
        # and nothing at/above the earliest still-QUEUED start (extracted
        # but waiting for a full window_batch) is committed yet
        pending = self._queue[0][0] if self._queue else self.received
        return self._emit(max(self.emitted,
                              min(self.received - self.window, pending)))

    def close(self) -> Tuple[int, np.ndarray]:
        """Flush: run the tail window(s), finalize remaining frames."""
        assert not self.closed, 'session is closed'
        self.closed = True
        L = self.received
        if L == 0:
            return self.emitted, np.zeros((0, self.num_classes),
                                          np.float32)
        if L < self.window:
            # offline short-video semantics: ONE pad-by-repeat window,
            # first L rows (data/windowing.py:111-121; bucket path in
            # train/trainer.py:648-664) — NOT a stitch (the repeated
            # tail rows are discarded, not averaged into frame L-1)
            idx = W.pad_short_window_indices(L, self.window)
            win = {k: np.ascontiguousarray(v[idx])
                   for k, v in self._buf.items()}
            inputs = {k: np.broadcast_to(
                v[None], (self.wb,) + v.shape).copy()
                for k, v in win.items()}
            length = (np.full((self.wb,), L, np.int32)
                      if self.needs_mask else None)
            out = np.asarray(self._call(inputs, length=length))
            self._buf = {}
            return self.emitted, out[0, :L].astype(np.float32)
        # remaining windows are exactly the uncommitted suffix of the
        # full start list: the committed regular starts 0, hop, ... are
        # its prefix, and only the tail [L-window, L) can be new
        starts = W.window_starts(L, self.window, self.hop)
        n_committed = sum(1 for s in starts
                          if s < self.next_start and s % self.hop == 0)
        for s in starts[n_committed:]:
            o = s - self._base
            assert o >= 0, (s, self._base)
            win = {k: np.ascontiguousarray(v[o:o + self.window])
                   for k, v in self._buf.items()}
            self._queue.append((s, win))
        self._dispatch(flush=True)
        self._buf = {}
        return self._emit(L)


class StreamingRegistry:
    """Thread-safe session book-keeping for the HTTP server."""

    def __init__(self, art, mesh=None):
        self.art = art
        self.mesh = mesh
        self._lock = threading.Lock()
        self._sessions: Dict[str, StreamingSession] = {}

    def open(self) -> str:
        sid = uuid.uuid4().hex[:12]
        with self._lock:
            self._sessions[sid] = StreamingSession(self.art,
                                                   mesh=self.mesh)
        return sid

    def feed(self, sid: str, frames) -> Tuple[int, np.ndarray]:
        with self._lock:
            sess = self._sessions[sid]
            return sess.feed(frames)

    def close(self, sid: str) -> Tuple[int, np.ndarray]:
        with self._lock:
            sess = self._sessions.pop(sid)
            return sess.close()
