"""Frozen serving artifacts (fvt_tpu/export.py + tools/export_serving.py).

The exported StableHLO program must be the SAME serving step the
Trainer dispatches (train/steps.py::make_eval_step incl. the device
transform), so artifact outputs are compared bitwise against the live
eval step at the exported shapes.  The reference has no analogue — it
reloads torch checkpoints inside the full stack per serving process
(/root/reference/inference_challenge.py, experiment.py:242-269)."""
import json
import os
import sys
import zipfile
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
from fvt_tpu.models.registry import init_model
from fvt_tpu.train.steps import make_eval_step, _device_transform
from fvt_tpu.export import (serving_input_specs, export_serving,
                            save_artifact, load_artifact)


def _tiny_args(model_name=constants.LFAN, **over):
    cfg = get_config('MELD')
    cfg.update(modality='vggish+bert+EXPR_continuous_label',
               model_name=model_name, window_length=8, hop_length=4,
               eval_window_batch=4)
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


def _rand_batch(specs, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for k, s in specs.items():
        if s.dtype == jnp.uint8:
            out[k] = rng.integers(0, 255, size=s.shape).astype(np.uint8)
        else:
            out[k] = rng.normal(size=s.shape).astype(np.float32) \
                .astype(s.dtype)
    return out


@pytest.fixture(scope='module')
def lfan_artifact(tmp_path_factory):
    args = _tiny_args()
    model, params, stats = _init_model(args)
    exports, aot, meta = export_serving(
        model, args.model_name, args, params, stats,
        shapes=[(4, 8)], platforms=('cpu',), aot=True)
    path = str(tmp_path_factory.mktemp('art') / 'lfan.fvtserve')
    save_artifact(path, exports, aot, meta, params, stats)
    return args, model, params, stats, path


def test_artifact_matches_live_eval_step(lfan_artifact):
    args, model, params, stats, path = lfan_artifact
    art = load_artifact(path, prefer_aot=False)
    batch = _rand_batch(serving_input_specs(args, 4), seed=1)

    live = np.asarray(make_eval_step(model)(params, stats, batch))
    frozen = np.asarray(art.call(batch))
    assert frozen.shape == live.shape == (4, 8, args.num_classes)
    np.testing.assert_array_equal(frozen, live)


def test_aot_executable_used_and_identical(lfan_artifact):
    args, model, params, stats, path = lfan_artifact
    art = load_artifact(path, prefer_aot=True)
    # the artifact was exported on this backend + jax version, so the
    # AOT executable must actually be selected
    assert art._aot, (art.meta.get('aot_backend'), jax.default_backend())
    batch = _rand_batch(serving_input_specs(args, 4), seed=2)
    via_aot = np.asarray(art.call(batch))
    via_export = np.asarray(load_artifact(path, prefer_aot=False)
                            .call(batch))
    np.testing.assert_array_equal(via_aot, via_export)
    # either the AOT tier validated and served, or the runtime refused
    # the deserialized executable (XLA:CPU does this host-dependently,
    # in-suite) and call() degraded to the portable export — never both,
    # never a crash
    assert bool(art._aot_validated) != bool(art.aot_fallbacks), (
        art._aot_validated, art.aot_fallbacks)


def test_aot_runtime_failure_falls_back(lfan_artifact):
    """A deserialized AOT executable that fails at execution (the
    XLA:CPU 'Function ... not found' class of failure) must be dropped
    with the error recorded, and the SAME call must be served by the
    portable export."""
    args, model, params, stats, path = lfan_artifact
    art = load_artifact(path, prefer_aot=False)
    key = art.shape_keys[0]

    def broken(*a):
        raise RuntimeError('Buffer Definition Event: synthetic')

    art._aot = {key: broken}
    batch = _rand_batch(serving_input_specs(args, 4), seed=11)
    out = np.asarray(art.call(batch))
    assert key in art.aot_fallbacks
    assert 'synthetic' in art.aot_fallbacks[key]
    assert not art._aot  # dropped, later calls skip the broken runner
    live = np.asarray(make_eval_step(model)(params, stats, batch))
    np.testing.assert_array_equal(out, live)


def test_weights_roundtrip_in_artifact(lfan_artifact):
    args, model, params, stats, path = lfan_artifact
    art = load_artifact(path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        art.params, jax.tree.map(np.asarray, dict(params)))


def test_shape_routing_and_miss(lfan_artifact):
    args, model, params, stats, path = lfan_artifact
    art = load_artifact(path)
    assert art.shape_keys == ['b4xt8']
    bad = _rand_batch(serving_input_specs(args, 2), seed=3)
    with pytest.raises(KeyError, match='no export'):
        art.call(bad)


def test_multiplatform_export_records_tpu():
    args = _tiny_args()
    model, params, stats = _init_model(args)
    exports, aot, meta = export_serving(
        model, args.model_name, args, params, stats,
        shapes=[(2, 8)], platforms=('cpu', 'tpu'), aot=False)
    assert meta['platforms'] == ['cpu', 'tpu']
    assert not aot
    # the multi-platform module still executes on cpu
    from jax import export as jexport
    exp = jexport.deserialize(exports['b2xt8'])
    batch = _rand_batch(serving_input_specs(args, 2), seed=4)
    out = exp.call(params, stats, batch)
    assert np.asarray(out).shape == (2, 8, args.num_classes)


def test_masked_model_export_mt():
    # JMT/MT fuse the video and vggish streams (model.py:900-975);
    # a tiny dense spatial module stands in for the ArcFace backbone
    import flax.linen as nn

    class TinySpatial(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            return nn.Dense(16)(x.reshape(x.shape[0], -1))

    args = _tiny_args(model_name=constants.MT,
                      modality='video+vggish+EXPR_continuous_label')
    model, params, stats = _init_model(args, spatial_video=TinySpatial())
    exports, aot, meta = export_serving(
        model, args.model_name, args, params, stats,
        shapes=[(2, 8)], platforms=('cpu',), aot=False)
    assert meta['needs_mask'] is True

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'mt.fvtserve')
        save_artifact(path, exports, aot, meta, params, stats)
        art = load_artifact(path)
        specs = serving_input_specs(args, 2)
        batch = _rand_batch(specs, seed=5)
        length = np.array([8, 5], np.int32)
        live = np.asarray(make_eval_step(model, needs_time_mask=True)(
            params, stats, batch, jnp.asarray(length)))
        frozen = np.asarray(art.call(batch, length=length))
        np.testing.assert_array_equal(frozen, live)
        # default length = full window
        full = np.asarray(art.call(batch))
        live_full = np.asarray(make_eval_step(model, needs_time_mask=True)(
            params, stats, batch, jnp.full((2,), 8, jnp.int32)))
        np.testing.assert_array_equal(full, live_full)


def test_call_sharded_matches_single_device(lfan_artifact):
    """One artifact, data-parallel serving: call_sharded re-jits the
    portable export with GSPMD shardings (batch over 'data', weights
    replicated) over the 8-virtual-device mesh and must reproduce the
    single-device call at f32 tolerance (the per-device program is
    recompiled at the sharded batch shape, so reduction/fusion order
    can differ at ~1e-6 — measured 8.3e-7 max abs; argmaxes must be
    identical)."""
    from fvt_tpu.parallel.mesh import make_mesh

    args, model, params, stats, path = lfan_artifact
    art = load_artifact(path, prefer_aot=False)
    batch = _rand_batch(serving_input_specs(args, 4), seed=12)

    mesh = make_mesh(4)  # wb=4 rows over 4 devices
    out = art.call_sharded(batch, mesh=mesh)
    assert len(out.sharding.device_set) == 4
    single = np.asarray(art.call(batch))
    np.testing.assert_allclose(np.asarray(out), single, atol=2e-5,
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out).argmax(-1),
                                  single.argmax(-1))

    # indivisible batch/mesh is a loud error
    with pytest.raises(AssertionError, match='divide'):
        art.call_sharded(batch, mesh=make_mesh(3))


def test_call_sharded_masked_model(tmp_path):
    """Masked (JMT/MT) artifacts shard the (B,) length vector too.
    MT fuses the video and vggish streams (models.py:224), so the
    masked artifact uses the TinySpatial stand-in like
    test_masked_model_export_mt."""
    import flax.linen as nn

    class TinySpatial(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            return nn.Dense(16)(x.reshape(x.shape[0], -1))

    args = _tiny_args(model_name=constants.MT,
                      modality='video+vggish+EXPR_continuous_label',
                      eval_window_batch=4)
    model, params, stats = _init_model(args, spatial_video=TinySpatial())
    exports, aot, meta = export_serving(
        model, args.model_name, args, params, stats,
        shapes=[(4, 8)], platforms=('cpu',))
    path = os.path.join(tmp_path, 'mt.fvtserve')
    save_artifact(path, exports, aot, meta, params, stats)
    art = load_artifact(path)

    from fvt_tpu.parallel.mesh import make_mesh
    batch = _rand_batch(serving_input_specs(args, 4), seed=13)
    length = np.array([8, 5, 8, 3], np.int32)
    out = np.asarray(art.call_sharded(batch, mesh=make_mesh(4),
                                      length=length))
    single = np.asarray(art.call(batch, length=length))
    np.testing.assert_allclose(out, single, atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(out.argmax(-1), single.argmax(-1))


def test_pallas_serving_export_single_platform_only():
    """--pallas_serving bakes the trace-time interpret/Mosaic choice
    into the program, so its exports are pinned to the exporting
    backend: multi-platform is refused, single-platform matches the
    live Pallas serving step bitwise."""
    from fvt_tpu.serve import build_lfan_serving_step

    args = _tiny_args(pallas_serving=True)
    model, params, stats = _init_model(args)

    with pytest.raises(AssertionError, match='single-platform'):
        export_serving(model, args.model_name, args, params, stats,
                       shapes=[(2, 8)], platforms=('cpu', 'tpu'))

    here = jax.default_backend()
    exports, _, meta = export_serving(
        model, args.model_name, args, params, stats,
        shapes=[(2, 8)], platforms=(here,))
    assert meta['platforms'] == [here]
    assert meta['flags']['pallas_serving'] is True
    from jax import export as jexport
    exp = jexport.deserialize(exports['b2xt8'])
    batch = _rand_batch(serving_input_specs(args, 2), seed=8)
    live = np.asarray(build_lfan_serving_step(model)(params, stats,
                                                     batch))
    np.testing.assert_array_equal(np.asarray(exp.call(params, stats,
                                                      batch)), live)


def test_bf16_feature_specs_honored():
    args = _tiny_args(h2d_bf16_features=True)
    specs = serving_input_specs(args, 4)
    assert all(s.dtype == jnp.bfloat16 for s in specs.values())
    model, params, stats = _init_model(args)
    exports, _, meta = export_serving(
        model, args.model_name, args, params, stats,
        shapes=[(2, 8)], platforms=('cpu',))
    assert meta['flags']['h2d_bf16_features'] is True
    from jax import export as jexport
    exp = jexport.deserialize(exports['b2xt8'])
    batch = _rand_batch(serving_input_specs(args, 2), seed=6)
    out = exp.call(params, stats, batch)
    live = make_eval_step(model)(params, stats, batch)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(live))


def test_cli_export_from_run_dir(tmp_path):
    """tools/export_serving.py end-to-end on a fake finished run dir:
    frozen config.yml + best-models/<case>/model.msgpack, exactly the
    files Trainer writes (trainer.py:866-874)."""
    import yaml
    from flax import serialization as fser

    args = _tiny_args()
    model, params, stats = _init_model(args)

    run = tmp_path / 'run'
    best = run / 'best-models' / 'w_f1-frames_avg_logits'
    os.makedirs(best)
    with open(run / 'config.yml', 'w') as f:
        yaml.dump(vars(args), f)
    with open(best / 'model.msgpack', 'wb') as f:
        f.write(fser.to_bytes(
            {'params': jax.tree.map(np.asarray, params),
             'batch_stats': jax.tree.map(np.asarray, stats)}))

    from export_serving import main
    out = str(tmp_path / 'serving.fvtserve')
    main(['--fd_exp', str(run), '--out', out, '--platforms', 'cpu',
          '--window_batch', '4'])

    art = load_artifact(out)
    assert art.meta['case_best_model'] == 'w_f1-frames_avg_logits'
    batch = _rand_batch(serving_input_specs(args, 4), seed=7)
    live = np.asarray(make_eval_step(model)(params, stats, batch))
    np.testing.assert_array_equal(np.asarray(art.call(batch)), live)

    with zipfile.ZipFile(out) as z:
        meta = json.loads(z.read('meta.json'))
    assert meta['shapes']['b4xt8']['inputs']['vggish']['shape'] == \
        [4, 8, 128]


def _int8_static_model(args):
    """Tri-modal model with the int8 backbone path live (what
    Experiment._spatial_modules builds for serve_quant=int8*)."""
    from fvt_tpu.models.arcface import VisualBackbone
    return _init_model(args,
                       spatial_video=VisualBackbone(conv_impl='int8'))


def test_int8_static_artifact_roundtrip():
    """int8_static serving in the frozen artifact (round-4 verdict #4):
    the calibrated activation scales are baked into the exported
    StableHLO (closed-over extra_vars) AND serialized into the
    artifact's weights; artifact.call must equal the live calibrated
    eval step bitwise."""
    from fvt_tpu.ops.quant import calibrate_act_scales

    args = _tiny_args(modality='video+vggish+bert+EXPR_continuous_label',
                      serve_quant='int8_static', window_length=2,
                      hop_length=2)
    model, params, stats = _int8_static_model(args)
    calib = _rand_batch(serving_input_specs(args, 2, 2), seed=3)
    scales = calibrate_act_scales(model, params, stats, calib)
    assert len(jax.tree.leaves(scales)) > 0
    extra = {'act_scales': scales}

    exports, aot, meta = export_serving(
        model, args.model_name, args, params, stats, shapes=[(2, 2)],
        platforms=('cpu',), extra_vars=extra)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        path = join(td, 'int8s.fvtserve')
        save_artifact(path, exports, aot, meta, params, stats,
                      extra_vars=extra)
        art = load_artifact(path, prefer_aot=False)
        assert art.extra_vars is not None  # scales rode the artifact
        batch = _rand_batch(serving_input_specs(args, 2, 2), seed=4)
        live = np.asarray(make_eval_step(model, extra_vars=extra)(
            params, stats, batch))
        frozen = np.asarray(art.call(batch))
        np.testing.assert_array_equal(frozen, live)
        # and the scales genuinely steer the program: a no-scale step
        # (dynamic int8) must differ on the same batch
        dyn = np.asarray(make_eval_step(model)(params, stats, batch))
        assert np.abs(dyn - live).max() > 0


def test_int8_static_cli_export_calibrates(tmp_path):
    """tools/export_serving.py on an int8_static run dir: calibrates
    one batch from --calib_store, embeds the scales, and the artifact
    reproduces the live calibrated eval; without a store it still
    refuses with an actionable error."""
    import yaml
    from flax import serialization as fser
    from synth_store import make_meld_store
    from fvt_tpu.ops.quant import calibrate_act_scales
    from export_serving import main

    store = str(tmp_path / 'store')
    make_meld_store(store, n_train=3, n_val=2, n_test=2, min_len=4,
                    max_len=8, with_video=True)

    args = _tiny_args(modality='video+vggish+bert+EXPR_continuous_label',
                      serve_quant='int8_static', window_length=2,
                      hop_length=2, train_batch_size=2, num_workers=1,
                      eval_bucket_quantum=2, calc_mean_std=True, seed=0,
                      dataset_path=str(tmp_path / 'absent'),
                      folds_dir=join(store, 'folds', 'MELD'),
                      outd=str(tmp_path / 'outd'))
    os.makedirs(args.outd, exist_ok=True)
    model, params, stats = _int8_static_model(args)

    run = tmp_path / 'run'
    best = run / 'best-models' / 'w_f1-frames_vote'
    os.makedirs(best)
    with open(run / 'config.yml', 'w') as f:
        yaml.dump(vars(args), f)
    with open(best / 'model.msgpack', 'wb') as f:
        f.write(fser.to_bytes(
            {'params': jax.tree.map(np.asarray, params),
             'batch_stats': jax.tree.map(np.asarray, stats)}))

    out = str(tmp_path / 'int8s.fvtserve')
    # no store anywhere -> actionable refusal (config dataset_path is
    # absent and no --calib_store given)
    with pytest.raises(SystemExit, match='calibration store'):
        main(['--fd_exp', str(run), '--out', out, '--platforms', 'cpu'])

    main(['--fd_exp', str(run), '--out', out, '--platforms', 'cpu',
          '--window_batch', '2', '--seq_len', '2',
          '--calib_store', store])

    art = load_artifact(out, prefer_aot=False)
    assert art.extra_vars is not None
    assert art.meta['flags']['serve_quant'] == 'int8_static'

    # live twin: calibrate on the SAME batch the CLI used (the loader
    # build is deterministic at seed 0)
    from types import SimpleNamespace
    from fvt_tpu.experiment import Experiment
    cargs = SimpleNamespace(**{**vars(args), 'dataset_path': store})
    exp = Experiment(cargs)
    exp.prepare()
    sample = exp._sample_batch(exp.init_loaders())
    scales = calibrate_act_scales(model, params, stats, sample)
    extra = {'act_scales': scales}
    batch = _rand_batch(serving_input_specs(args, 2, 2), seed=9)
    live = np.asarray(make_eval_step(model, extra_vars=extra)(
        params, stats, batch))
    np.testing.assert_array_equal(np.asarray(art.call(batch)), live)


def test_http_serving_endpoint(lfan_artifact):
    """tools/serve_http.py: the artifact serves over HTTP with no
    training stack — healthz, meta, logits (npz in/out), and a 400
    with the available shapes on a shape miss."""
    import io
    import threading
    import urllib.request
    import urllib.error

    from serve_http import build_server

    args, model, params, stats, path = lfan_artifact
    srv = build_server(path, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f'http://127.0.0.1:{srv.server_port}'
    try:
        with urllib.request.urlopen(f'{base}/healthz') as r:
            h = json.loads(r.read())
        assert h['ok'] and h['shapes'] == ['b4xt8']

        batch = _rand_batch(serving_input_specs(args, 4), seed=9)
        buf = io.BytesIO()
        np.savez(buf, **batch)
        req = urllib.request.Request(f'{base}/logits', data=buf.getvalue(),
                                     method='POST')
        with urllib.request.urlopen(req) as r:
            with np.load(io.BytesIO(r.read())) as z:
                got = z['logits']
        live = np.asarray(make_eval_step(model)(params, stats, batch))
        np.testing.assert_array_equal(got, live)

        # shape miss -> 400 listing the exported shapes
        bad = _rand_batch(serving_input_specs(args, 2), seed=10)
        buf = io.BytesIO()
        np.savez(buf, **bad)
        req = urllib.request.Request(f'{base}/logits', data=buf.getvalue(),
                                     method='POST')
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert 'b4xt8' in json.loads(ei.value.read())['shapes']
    finally:
        srv.shutdown()


def test_http_serving_mesh(lfan_artifact):
    """tools/serve_http.py --mesh N: requests are served data-parallel
    via call_sharded; indivisible batches come back as 400."""
    import io
    import threading
    import urllib.request
    import urllib.error

    from serve_http import build_server

    args, model, params, stats, path = lfan_artifact
    srv = build_server(path, port=0, prefer_aot=False, mesh_devices=4)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f'http://127.0.0.1:{srv.server_port}'
    try:
        with urllib.request.urlopen(f'{base}/healthz') as r:
            h = json.loads(r.read())
        assert h['ok'] and h['mesh'] == 4

        batch = _rand_batch(serving_input_specs(args, 4), seed=14)
        buf = io.BytesIO()
        np.savez(buf, **batch)
        req = urllib.request.Request(f'{base}/logits', data=buf.getvalue(),
                                     method='POST')
        with urllib.request.urlopen(req) as r:
            with np.load(io.BytesIO(r.read())) as z:
                got = z['logits']
        live = np.asarray(make_eval_step(model)(params, stats, batch))
        np.testing.assert_allclose(got, live, atol=2e-5, rtol=1e-5)
        np.testing.assert_array_equal(got.argmax(-1), live.argmax(-1))
    finally:
        srv.shutdown()


def test_artifact_inference_matches_trainer(tmp_path):
    """tools/infer_artifact.py: full eval from (store + artifact) with
    no model code reproduces Trainer.inference per-video — bitwise-ish
    (float32 reduction-order: different batch shapes, different XLA
    programs) with identical argmaxes.  Long videos exercise the stitch
    path, short ones the single-window path."""
    from fvt_tpu.experiment import Experiment
    from synth_store import make_meld_store

    store = make_meld_store(str(tmp_path / 'store'), n_train=4, n_val=3,
                            n_test=6, min_len=6, max_len=40)
    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               modality='vggish+bert+EXPR_continuous_label',
               window_length=16, hop_length=8, eval_bucket_quantum=8,
               num_workers=1, calc_mean_std=True, seed=0,
               outd=str(tmp_path / 'out'))
    args = SimpleNamespace(**cfg)

    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    _, pv_live = trainer.inference(loaders[constants.TESTSET])

    exports, aot, meta = export_serving(
        trainer.model, args.model_name, args, trainer.state.params,
        trainer.state.batch_stats, shapes=[(8, 16)], platforms=('cpu',))
    path = str(tmp_path / 'serving.fvtserve')
    save_artifact(path, exports, aot, meta, trainer.state.params,
                  trainer.state.batch_stats)

    from infer_artifact import run as art_run
    perf, pv_art, _ = art_run(args, path)

    assert list(pv_art) == list(pv_live)
    lens = {t: len(pv_live[t]['labels']) for t in pv_live}
    assert min(lens.values()) == 16 and max(lens.values()) > 16  # both paths
    for t in pv_live:
        np.testing.assert_array_equal(pv_art[t]['labels'],
                                      pv_live[t]['labels'])
        a, b = pv_art[t]['logits'], pv_live[t]['logits']
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)
        np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))
    assert perf  # compute_perf ran over the artifact outputs

    # --mesh leg: the same artifact eval served data-parallel over a
    # 4-device mesh (wb=8 divides) reproduces the live outputs too
    _, pv_mesh, _ = art_run(args, path, mesh_devices=4)
    for t in pv_live:
        np.testing.assert_allclose(pv_mesh[t]['logits'],
                                   pv_live[t]['logits'],
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_array_equal(
            pv_mesh[t]['logits'].argmax(-1),
            pv_live[t]['logits'].argmax(-1))
