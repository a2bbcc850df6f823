"""Frozen serving artifacts: portable StableHLO export + optional AOT.

The reference's deployment story is "ship the torch checkpoint and
re-build the model around it at load" (/root/reference/experiment.py:242-269,
inference_challenge.py) — every serving process pays model-code import,
checkpoint surgery and a fresh trace.  On TPU the cost is worse: the
first jit compile of the serving step is 20-120 s per input shape
(CLAUDE.md), and the compilation cache only helps hosts that share
``~/.cache``.  A production fleet wants a *frozen artifact*: one file
that pins the serving computation (already traced, version-stable
StableHLO via ``jax.export``), the weights, and the exact input
shapes/dtypes the live serving path uses — loadable without the
training stack.

Artifact (a zip, suggested suffix ``.fvtserve``)::

    meta.json                   format/model/shape/flag metadata
    weights.msgpack             {'params', 'batch_stats'} state dicts
    exports/<key>.bin           jax.export serialization, one per shape
    aot/<key>.pkl               optional: platform-specific compiled
                                executable (zero-compile load on an
                                identical backend+jax version)

Two consumption tiers:

- ``exports/``: portable across machines and (forward-compatible) jax
  versions, multi-platform (``--platforms cpu,tpu``); the target host
  still runs the XLA *backend* compile once per shape, but no Python
  tracing and no model code.
- ``aot/``: ``jax.experimental.serialize_executable`` of the fully
  compiled program — load-and-run with ZERO compile, valid only on the
  same backend kind + jax version (both checked at load).  Produce it
  on a host of the serving platform (the AOT blob compiles for the
  exporting host's backend).  NB XLA:CPU AOT code is additionally
  machine-feature-sensitive (a different CPU generation logs loud
  feature-mismatch warnings and may SIGILL); the intended AOT target
  is a fleet of identical TPU hosts — heterogeneous consumers should
  load with ``prefer_aot=False``.

The exported function is exactly the live serving step — the same
``make_eval_step`` (or Pallas serving step / int8 path) the Trainer
uses, including the on-device eval transform and the bf16-feature
upcast — so artifact outputs are bit-identical to ``Trainer.inference``
dispatches at the same shapes (pinned by tests/test_export_serving.py).
"""
from __future__ import annotations

import io
import json
import pickle
import zipfile
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization as fser

from fvt_tpu import constants
from fvt_tpu.config import model_config as MC

FORMAT_VERSION = 1
_MASKED_MODELS = (constants.JMT, constants.MT)


def _shape_key(wb: int, t: int) -> str:
    return f"b{wb}xt{t}"


def _feat_dtype(args) -> Any:
    return jnp.bfloat16 if getattr(args, 'h2d_bf16_features', False) \
        else jnp.float32


def serving_input_specs(args, window_batch: int, seq_len: Optional[int] = None
                        ) -> Dict[str, jax.ShapeDtypeStruct]:
    """ShapeDtypeStructs of ONE pooled serving batch, matching what the
    live loaders ship (data/loader.py + trainer.inference): raw video as
    uint8 (pre-cropped to CROP_SIZE when --h2d_precrop_video, the
    default), feature streams in fp32 (bf16 under --h2d_bf16_features),
    raw log-mel patches at VGGish input geometry."""
    from fvt_tpu.data.transforms import CROP_SIZE, SCALE_SIZE
    from fvt_tpu.models.registry import split_modality

    wb = int(window_batch)
    t = int(seq_len or args.window_length)
    fdt = _feat_dtype(args)
    specs: Dict[str, jax.ShapeDtypeStruct] = {}
    for m in split_modality(args.modality):
        if m == constants.VIDEO:
            s = CROP_SIZE if getattr(args, 'h2d_precrop_video', True) \
                else SCALE_SIZE
            specs[m] = jax.ShapeDtypeStruct((wb, t, s, s, 3), jnp.uint8)
        else:
            dim = MC.FEATURE_DIMENSION[m]
            specs[m] = jax.ShapeDtypeStruct((wb, t) + tuple(dim), fdt)
    return specs


def build_serving_fn(model, model_name: str, args,
                     extra_vars: Optional[Dict[str, Any]] = None):
    """The live serving step, selected exactly like Trainer.__init__
    (train/trainer.py:111-122): masked eval for JMT/MT, the fused-TCN
    Pallas step for LFAN under --pallas_serving, plain eval otherwise.
    Returns (jitted_fn, needs_mask)."""
    from fvt_tpu.train.steps import make_eval_step

    needs_mask = model_name in _MASKED_MODELS
    if needs_mask:
        return make_eval_step(model, needs_time_mask=True,
                              extra_vars=extra_vars), True
    if model_name == constants.LFAN and getattr(args, 'pallas_serving',
                                                False):
        from fvt_tpu.serve import build_lfan_serving_step
        assert not extra_vars, \
            'pallas_serving + int8_static are mutually exclusive (parse.py)'
        return build_lfan_serving_step(model), False
    return make_eval_step(model, extra_vars=extra_vars), False


def _spec_tree(tree) -> Any:
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        tree)


def export_serving(model, model_name: str, args, params, batch_stats,
                   shapes: Sequence[Tuple[int, int]],
                   platforms: Sequence[str] = ('cpu', 'tpu'),
                   aot: bool = False,
                   extra_vars: Optional[Dict[str, Any]] = None,
                   ) -> Tuple[Dict[str, bytes], Dict[str, bytes], dict]:
    """Export the serving step at every ``(window_batch, seq_len)`` in
    ``shapes``.  Returns (exports, aot_blobs, meta) — bytes keyed by
    shape key.  ``aot`` additionally AOT-compiles for THIS process's
    backend and serializes the executable (zero-compile load on an
    identical platform; skipped per-shape with a warning if the backend
    refuses serialization)."""
    from jax import export as jexport
    from fvt_tpu.utils.logger import log

    if model_name == constants.LFAN and getattr(args, 'pallas_serving',
                                                False):
        # the Pallas serving step picks interpret-vs-Mosaic at TRACE
        # time from the local backend (ops/tcn_pallas.py:83-84): a
        # multi-platform export would bake interpret mode into the TPU
        # program (silent ~1.6x serving regression) or an unloadable
        # Mosaic custom call into the CPU one
        here = jax.default_backend()
        assert list(platforms) == [here], (
            f"--pallas_serving exports are single-platform: the Pallas "
            f"kernels lower for the exporting host's backend ({here!r}) "
            f"only — requested {list(platforms)}. Export with "
            f"--platforms {here}, or export the plain XLA step "
            f"(pallas_serving=False) for multi-platform artifacts")

    fn, needs_mask = build_serving_fn(model, model_name, args,
                                      extra_vars=extra_vars)
    p_spec, s_spec = _spec_tree(params), _spec_tree(batch_stats)

    exports: Dict[str, bytes] = {}
    aot_blobs: Dict[str, bytes] = {}
    shape_meta = {}
    for wb, t in shapes:
        key = _shape_key(wb, t)
        specs = serving_input_specs(args, wb, t)
        call_args = (p_spec, s_spec, specs)
        if needs_mask:
            call_args += (jax.ShapeDtypeStruct((wb,), jnp.int32),)
        exp = jexport.export(fn, platforms=list(platforms))(*call_args)
        exports[key] = exp.serialize()
        shape_meta[key] = {
            'window_batch': wb, 'seq_len': t,
            'inputs': {k: {'shape': list(v.shape),
                           'dtype': jnp.dtype(v.dtype).name}
                       for k, v in specs.items()},
        }
        if aot:
            from jax.experimental import serialize_executable as se
            try:
                compiled = fn.lower(*call_args).compile()
                blob, in_tree, out_tree = se.serialize(compiled)
                aot_blobs[key] = pickle.dumps(
                    (blob, in_tree, out_tree),
                    protocol=pickle.HIGHEST_PROTOCOL)
            except Exception as e:  # backend may not support serialization
                log(f"WARNING: AOT serialization skipped for {key}: {e}")

    meta = {
        'format_version': FORMAT_VERSION,
        'jax_version': jax.__version__,
        'model_name': model_name,
        'modality': args.modality,
        'num_classes': getattr(args, 'num_classes', None),
        'needs_mask': needs_mask,
        'platforms': list(platforms),
        'aot_backend': jax.default_backend() if aot_blobs else None,
        'window_length': getattr(args, 'window_length', None),
        'hop_length': getattr(args, 'hop_length', None),
        'flags': {k: getattr(args, k, None) for k in
                  ('amp', 'serve_quant', 'pallas_serving',
                   'h2d_bf16_features', 'h2d_precrop_video')},
        'shapes': shape_meta,
    }
    return exports, aot_blobs, meta


def save_artifact(path: str, exports: Dict[str, bytes],
                  aot_blobs: Dict[str, bytes], meta: dict,
                  params, batch_stats,
                  extra_vars: Optional[Dict[str, Any]] = None) -> None:
    weights = {'params': fser.to_state_dict(params),
               'batch_stats': fser.to_state_dict(batch_stats)}
    if extra_vars:
        weights['extra_vars'] = fser.to_state_dict(extra_vars)
    with zipfile.ZipFile(path, 'w', zipfile.ZIP_DEFLATED) as z:
        z.writestr('meta.json', json.dumps(meta, indent=2, default=str))
        z.writestr('weights.msgpack', fser.msgpack_serialize(weights))
        for key, data in exports.items():
            z.writestr(f'exports/{key}.bin', data)
        for key, data in aot_blobs.items():
            z.writestr(f'aot/{key}.pkl', data)


class ServingArtifact:
    """A loaded ``.fvtserve``: weights bound, one callable per shape.

    ``call(batch[, length])`` routes by the batch's (B, T) to the
    matching export; AOT executables are preferred when present AND the
    local backend kind + jax version match what produced them
    (otherwise the portable export path is used and XLA compiles once
    per shape — still no Python tracing, no model code).

    AOT executables are additionally VALIDATED on their first call per
    shape (run + result materialization): XLA:CPU AOT blobs are
    machine-feature-sensitive and the runtime can refuse a deserialized
    executable only at execution time (observed in-suite as
    ``Buffer Definition Event: Function ... not found``).  A failing
    runner is dropped with a warning — recorded in ``aot_fallbacks`` —
    and the call is re-dispatched through the portable export, so a
    serving host never crashes on a bad AOT tier, it degrades to the
    compile-once tier."""

    def __init__(self, path: str, prefer_aot: bool = True):
        from jax import export as jexport

        self.path = path
        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read('meta.json'))
            weights = fser.msgpack_restore(z.read('weights.msgpack'))
            names = z.namelist()
            self._exports = {
                n.split('/', 1)[1][:-len('.bin')]: jexport.deserialize(
                    z.read(n))
                for n in names if n.startswith('exports/')}
            # jit the deserialized calls once: eager Exported.call
            # re-traces through call_exported per invocation (~4 ms/call
            # host overhead measured on the tiny LFAN; the compiled
            # program itself is cached either way)
            self._callers = {k: jax.jit(e.call)
                             for k, e in self._exports.items()}
            self._aot = {}
            use_aot = (prefer_aot
                       and self.meta.get('aot_backend') ==
                       jax.default_backend()
                       and self.meta.get('jax_version') == jax.__version__)
            if use_aot:
                from jax.experimental import serialize_executable as se
                for n in names:
                    if not n.startswith('aot/'):
                        continue
                    key = n.split('/', 1)[1][:-len('.pkl')]
                    blob, in_tree, out_tree = pickle.loads(z.read(n))
                    # the serving step is single-device by construction
                    # (no shardings): load onto ONE device, or a multi-
                    # device host (e.g. the 8-virtual-CPU test mesh)
                    # rejects the executable's 1-shard args
                    self._aot[key] = se.deserialize_and_load(
                        blob, in_tree, out_tree,
                        execution_devices=jax.local_devices()[:1])
        # weights live ON DEVICE from load: with host-numpy trees every
        # call would re-ship the full weight set (10 MB for the tiny
        # LFAN, ~100 MB tri-modal) — measured 0.33 s/call on the axon
        # tunnel vs ~ms for the batch alone.  device_put once; calls
        # then upload only the batch.
        dev = jax.local_devices()[0]
        self.params = jax.device_put(weights['params'], dev)
        self.batch_stats = jax.device_put(weights['batch_stats'], dev)
        self.extra_vars = (jax.device_put(weights['extra_vars'], dev)
                           if weights.get('extra_vars') is not None
                           else None)
        self.needs_mask = bool(self.meta.get('needs_mask'))
        self._aot_validated: set = set()
        self.aot_fallbacks: Dict[str, str] = {}
        self._sharded_fns: Dict[Any, Any] = {}
        self._sharded_weights: Dict[Any, Any] = {}

    @property
    def shape_keys(self) -> List[str]:
        return sorted(self._exports)

    def _route(self, batch: Dict[str, np.ndarray]) -> str:
        b, t = next(iter(batch.values())).shape[:2]
        key = _shape_key(b, t)
        if key not in self._exports:
            raise KeyError(
                f"no export for batch shape ({b}, {t}); artifact has "
                f"{self.shape_keys} — re-export with this shape or pad "
                f"the batch to one of them")
        return key

    def call(self, batch: Dict[str, np.ndarray], length=None) -> jax.Array:
        """(B, T, C) logits for one pooled serving batch — same
        semantics as the live eval step at this shape."""
        key = self._route(batch)
        args = (self.params, self.batch_stats, batch)
        if self.needs_mask:
            b = next(iter(batch.values())).shape[0]
            if length is None:
                length = np.full((b,), self.meta['shapes'][key]['seq_len'],
                                 np.int32)
            args += (np.broadcast_to(np.asarray(length, np.int32),
                                     (b,)),)
        runner = self._aot.get(key)
        if runner is not None:
            if key in self._aot_validated:
                return runner(*args)
            # first call per shape: prove the deserialized executable
            # actually runs AND its results materialize on this host
            # before trusting it (XLA:CPU AOT can fail only here)
            try:
                out = np.asarray(runner(*args))
            except Exception as e:
                from fvt_tpu.utils.logger import log
                self.aot_fallbacks[key] = f"{type(e).__name__}: {e}"
                del self._aot[key]
                log(f"WARNING: AOT executable for {key} failed on this "
                    f"host ({type(e).__name__}: {e}); falling back to "
                    f"the portable export (compiles once)")
            else:
                self._aot_validated.add(key)
                return out
        return self._callers[key](*args)

    def call_sharded(self, batch: Dict[str, np.ndarray], mesh=None,
                     length=None) -> jax.Array:
        """Data-parallel serving from the SAME artifact: the portable
        export is re-jitted with GSPMD shardings over ``mesh`` — batch
        dim over the 'data' axis, weights replicated — so one
        ``.fvtserve`` serves across a pod slice with no re-export (XLA
        partitions the single-device program; collectives ride ICI).

        ``mesh`` defaults to a 1-D 'data' mesh over all local devices.
        The routed window_batch must divide by the mesh's device count.
        AOT executables are single-device by construction and are never
        used here.  Outputs match the single-device ``call`` at f32
        tolerance (per-device programs recompile at the sharded batch
        shape; measured 8.3e-7 max abs drift, identical argmaxes)."""
        from jax.sharding import NamedSharding, PartitionSpec
        from fvt_tpu.parallel.mesh import make_mesh

        if mesh is None:
            mesh = make_mesh()
        key = self._route(batch)
        b = next(iter(batch.values())).shape[0]
        n = mesh.devices.size
        assert b % n == 0, (
            f"window_batch {b} must divide by the mesh's {n} devices — "
            f"export a divisible shape or pass a smaller mesh")
        axis = mesh.axis_names[0]
        shard = NamedSharding(mesh, PartitionSpec(axis))
        repl = NamedSharding(mesh, PartitionSpec())

        mesh_key = (key, tuple(d.id for d in mesh.devices.flat), axis)
        if mesh_key not in self._sharded_fns:
            in_sh = [repl, repl, {k: shard for k in batch}]
            if self.needs_mask:
                in_sh.append(shard)
            self._sharded_fns[mesh_key] = jax.jit(
                self._exports[key].call, in_shardings=tuple(in_sh),
                out_shardings=shard)
        wkey = mesh_key[1]
        if wkey not in self._sharded_weights:
            # single-device-committed weights can't feed a mesh-jitted
            # fn; replicate once per mesh and reuse
            self._sharded_weights[wkey] = (
                jax.device_put(jax.tree.map(np.asarray, self.params),
                               repl),
                jax.device_put(jax.tree.map(np.asarray,
                                            self.batch_stats), repl))
        p, s = self._sharded_weights[wkey]
        args = (p, s, batch)
        if self.needs_mask:
            if length is None:
                length = np.full((b,), self.meta['shapes'][key]['seq_len'],
                                 np.int32)
            args += (np.broadcast_to(np.asarray(length, np.int32), (b,)),)
        return self._sharded_fns[mesh_key](*args)


def load_artifact(path: str, prefer_aot: bool = True) -> ServingArtifact:
    return ServingArtifact(path, prefer_aot=prefer_aot)
