"""External-resource preflight: detect every OPTIONAL resource the
framework can consume (the four published weight files, the opensmile
package/binary, vosk) and, for each one present, run the corresponding
numerics-parity check on the spot — so the day a resource appears, one
command converts the coverage table's ``*`` into a validated ✓.

Resources and where they're looked for:

  arcface    FVT_ARCFACE_WEIGHTS | <torch hub>/res50_ir_0.887.pth
             (reference configs.py:140; loaded by
             /root/reference/models/backbone.py:69-97)
  vggish     FVT_VGGISH_WEIGHTS | <torch hub>/vggish.pth
             (models/backbone.py:16-66)
  retinaface FVT_RETINAFACE_WEIGHTS | <torch hub>/
             retinaface_resnet50_2020-07-20.pth
             (abaw5_pre_processing/dlib/face_landmarks/retinaface_align.py)
  fan        FVT_FAN_WEIGHTS | <torch hub>/2DFAN4-cd938726ad.zip
             (base/preprocessing.py:191-195 via face_alignment)
  opensmile  the `opensmile` python package (base/audio.py:73-117) and
             the SMILExtract binary (bundled mfcc conf)
  vosk       the `vosk` package + FVT_VOSK_MODEL dir (base/speech.py)

Checks run per present resource:

  arcface/vggish  load the published file into the IMPORTED torch
                  reference module AND into the fvt_tpu port; compare
                  forward outputs at fp32 tolerance on random inputs
  retinaface/fan  load into the native JAX port, run detect/landmarks on
                  a synthetic image (finite, contract-shaped outputs);
                  cross-check against the ternaus `retinaface` /
                  `face_alignment` torch packages when importable
  opensmile       eGeMAPSv02 Functionals column-name order must equal
                  egemaps.COLUMNS, and per-column deltas vs the native
                  extractor are reported on a synthetic tone
  vosk            transcribe 0.5 s of silence -> returns a str

Usage:
  python tools/preflight.py [--out PREFLIGHT.json]

Exits 0 when every PRESENT resource passes its check (absent resources
are reported, not failures); 1 when a present resource fails.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

TOL = dict(rtol=2e-4, atol=2e-5)


def _force_cpu():
    """Pin jax to CPU before first use. The fp32-tolerance parity checks
    must not run on the TPU (reduced-precision matmul passes would fail a
    correct port, and a wedged tunnel would hang the gate). On axon the
    env var JAX_PLATFORMS is ignored once the PJRT plugin is importable;
    only this config call reliably wins (CLAUDE.md)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')


def _hub_path(fname: str) -> str | None:
    hub = os.environ.get('TORCH_HOME', os.path.expanduser('~/.cache/torch'))
    p = os.path.join(hub, 'hub', 'checkpoints', fname)
    return p if os.path.isfile(p) else None


def _weights(env_var: str, fname: str) -> str | None:
    p = os.environ.get(env_var)
    if p:
        if not os.path.isfile(p):
            raise FileNotFoundError(f'{env_var} set but {p!r} missing')
        return p
    return _hub_path(fname)


def _add_reference():
    from conftest import add_reference_to_path
    add_reference_to_path()


# ----------------------------------------------------------------- checks
def check_arcface() -> dict:
    path = _weights('FVT_ARCFACE_WEIGHTS', 'res50_ir_0.887.pth')
    if path is None:
        return {'present': False}
    _add_reference()
    import torch
    import jax.numpy as jnp
    from models.backbone import VisualBackbone as RefVB
    from fvt_tpu.models.arcface import (VisualBackbone,
                                        visual_backbone_from_torch)

    ref = RefVB(use_pretrained=True, state_dict_path=path, mode='ir')
    ref.eval()
    sd = {k: v for k, v in ref.state_dict().items()}
    params, stats = visual_backbone_from_torch(sd)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 3, 40, 40)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = VisualBackbone()
    got = np.asarray(model.apply(
        {'params': params, 'batch_stats': stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    maxd = float(np.abs(got - want).max())
    np.testing.assert_allclose(got, want, **TOL)
    return {'present': True, 'source': path, 'ok': True,
            'max_abs_delta': maxd,
            'check': 'published weights: torch reference forward vs '
                     'fvt_tpu port, fp32 tolerance'}


def check_vggish() -> dict:
    path = _weights('FVT_VGGISH_WEIGHTS', 'vggish.pth')
    if path is None:
        return {'present': False}
    _add_reference()
    import torch
    import jax.numpy as jnp
    from models.backbone import VGGish as RefVGGish
    from fvt_tpu.models.vggish import VGGish, vggish_from_torch

    ref = RefVGGish()
    ref.load_state_dict(torch.load(path, map_location='cpu'))
    ref.eval()
    params = vggish_from_torch({k: v for k, v in ref.state_dict().items()})

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 96, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(VGGish().apply({'params': params}, jnp.asarray(x)))
    maxd = float(np.abs(got - want).max())
    np.testing.assert_allclose(got, want, **TOL)
    return {'present': True, 'source': path, 'ok': True,
            'max_abs_delta': maxd,
            'check': 'published weights: torch reference forward vs '
                     'fvt_tpu port, fp32 tolerance'}


def _face_image() -> np.ndarray:
    """Check image for the detector/landmarker gates: a real face photo
    from FVT_PREFLIGHT_IMAGE when provided, else a synthetic 512x512 RGB
    high-contrast face-like blob (a real port may legitimately score the
    synthetic blob below threshold — zero detections then mark the check
    failed with a pointer to this env var, NOT vacuously ok)."""
    p = os.environ.get('FVT_PREFLIGHT_IMAGE')
    if p:
        from PIL import Image
        return np.asarray(Image.open(p).convert('RGB'))
    return _synthetic_face_image()


def _synthetic_face_image() -> np.ndarray:
    rng = np.random.default_rng(3)
    img = rng.integers(40, 80, size=(512, 512, 3)).astype(np.uint8)
    yy, xx = np.mgrid[:512, :512]
    face = ((yy - 256) ** 2 / 150 ** 2 + (xx - 256) ** 2 / 110 ** 2) < 1
    img[face] = (200, 170, 150)
    for cy, cx in ((215, 210), (215, 300)):
        eye = ((yy - cy) ** 2 + (xx - cx) ** 2) < 15 ** 2
        img[eye] = (30, 30, 30)
    mouth = (np.abs(yy - 320) < 8) & (np.abs(xx - 256) < 40)
    img[mouth] = (120, 40, 40)
    return img


def check_retinaface() -> dict:
    from fvt_tpu.preprocess import retinaface as RF
    path = RF._default_weights_path()
    if path is None:
        return {'present': False}
    det = RF.RetinaFaceJAX(weights_path=path)
    img = _face_image()
    faces = det.detect(img)
    for f in faces:
        assert np.isfinite(f['bbox']).all() and np.isfinite(f['score'])
        assert np.isfinite(np.asarray(f['landmarks'])).all()
    out = {'present': True, 'source': path, 'ok': len(faces) > 0,
           'native_detections': len(faces),
           'check': 'native JAX port runs on the published weights '
                    '(>=1 finite contract-shaped detection)'}
    if not faces:
        out['reason'] = ('no detections on the check image — a broken '
                         'port would also produce this; point '
                         'FVT_PREFLIGHT_IMAGE at a real face photo')
    try:  # full cross-check only when the torch package exists
        from retinaface.pre_trained_models import get_model
        import torch  # noqa: F401
        m = get_model('resnet50_2020-07-20', max_size=512, device='cpu')
        m.eval()
        ref = m.predict_jsons(img)
        ref = [r for r in ref if r.get('score', -1) >= 0.9]
        out['torch_package_detections'] = len(ref)
        out['cross_check'] = 'ran (ternaus retinaface package)'
        if len(ref) == len(faces) and faces:
            d = max(float(np.abs(np.asarray(a['bbox'])
                                 - np.asarray(b['bbox'])).max())
                    for a, b in zip(faces, ref))
            out['max_bbox_delta_px'] = d
            out['ok'] = bool(d <= 2.0)
        else:
            out['ok'] = len(ref) == len(faces)
    except ImportError:
        out['cross_check'] = 'skipped (retinaface torch package absent)'
    return out


def check_fan() -> dict:
    from fvt_tpu.preprocess import fan as FAN
    path = FAN._default_weights_path()
    if path is None:
        return {'present': False}
    lmk = FAN.make_full_frame_landmarker(weights_path=path)
    img = _face_image()
    pts = lmk(img)
    assert pts is None or (np.asarray(pts).shape == (68, 2)
                           and np.isfinite(np.asarray(pts)).all())
    out = {'present': True, 'source': path, 'ok': True,
           'native_landmarks': None if pts is None else 68,
           'check': 'native JAX port runs on the published weights '
                    '(finite (68, 2) output)'}
    try:
        import face_alignment
        fa = face_alignment.FaceAlignment(
            face_alignment.LandmarksType.TWO_D, device='cpu')
        ref = fa.get_landmarks(img)
        out['cross_check'] = 'ran (face_alignment package)'
        if ref and pts is not None:
            d = float(np.abs(np.asarray(pts) - ref[0][:, :2]).max())
            out['max_landmark_delta_px'] = d
            out['ok'] = bool(d <= 2.0)
    except ImportError:
        out['cross_check'] = 'skipped (face_alignment package absent)'
    return out


def check_opensmile() -> dict:
    try:
        import opensmile
    except ImportError:
        return {'present': False}
    from fvt_tpu.preprocess import egemaps as native

    smile = opensmile.Smile(
        feature_set=opensmile.FeatureSet.eGeMAPSv02,
        feature_level=opensmile.FeatureLevel.Functionals)
    cols_ok = list(smile.feature_names) == list(native.COLUMNS)

    sr = 16000
    t = np.arange(3 * sr) / sr
    rng = np.random.default_rng(0)
    wav = (0.4 * np.sin(2 * np.pi * 150 * t)
           * (1 + 0.2 * np.sin(2 * np.pi * 3 * t))
           + 0.02 * rng.normal(size=t.shape)).astype(np.float32)
    import tempfile
    import wave
    with tempfile.NamedTemporaryFile(suffix='.wav', delete=False) as f:
        wav_path = f.name
    with wave.open(wav_path, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())
    try:
        ref = np.asarray(smile.process_file(wav_path).values[0],
                         np.float64)
        got = np.asarray(native.egemaps_functionals(wav, sr), np.float64)
        denom = np.maximum(np.abs(ref), 1e-3)
        rel = np.abs(got - ref) / denom
        worst = int(np.argmax(rel))
        out = {
            'present': True, 'source': 'opensmile python package',
            'column_order_matches': bool(cols_ok),
            'median_rel_delta': float(np.median(rel)),
            'max_rel_delta': float(rel.max()),
            'worst_column': native.COLUMNS[worst],
            'ok': bool(cols_ok and np.isfinite(got).all()),
            'check': 'eGeMAPSv02 Functionals column contract + '
                     'per-column deltas vs the native extractor '
                     '(spec-conformant, not bit-exact: deltas are '
                     'REPORTED for human review)',
        }
    finally:
        os.unlink(wav_path)
    import shutil
    out['smilextract_binary'] = shutil.which('SMILExtract') or None
    return out


def check_vosk() -> dict:
    try:
        import vosk  # noqa: F401
    except ImportError:
        return {'present': False}
    model_dir = os.environ.get('FVT_VOSK_MODEL')
    out = {'present': True, 'source': 'vosk package',
           'model_dir': model_dir}
    if not model_dir:
        out['check'] = 'package importable; set FVT_VOSK_MODEL to run ' \
                       'the transcriber contract'
        out['ok'] = True
        return out
    import tempfile
    import wave
    from fvt_tpu.preprocess.textalign import make_vosk_transcriber
    with tempfile.NamedTemporaryFile(suffix='.wav', delete=False) as f:
        path = f.name
    with wave.open(path, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(8000, np.int16).tobytes())
    try:
        text = make_vosk_transcriber(model_dir)(path)
        out['ok'] = isinstance(text, str)
        out['check'] = 'transcribed 0.5 s of silence -> str'
    finally:
        os.unlink(path)
    return out


CHECKS = {
    'arcface': check_arcface,
    'vggish': check_vggish,
    'retinaface': check_retinaface,
    'fan': check_fan,
    'opensmile': check_opensmile,
    'vosk': check_vosk,
}


def run_all() -> dict:
    _force_cpu()
    report = {}
    for name, fn in CHECKS.items():
        try:
            report[name] = fn()
        except Exception:
            report[name] = {'present': True, 'ok': False,
                            'error': traceback.format_exc(limit=6)}
    report['summary'] = {
        'present': [k for k, v in report.items()
                    if isinstance(v, dict) and v.get('present')],
        'failed': [k for k, v in report.items()
                   if isinstance(v, dict) and v.get('present')
                   and not v.get('ok')],
    }
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument('--out', default=None)
    args = p.parse_args(argv)
    report = run_all()
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)
    return 1 if report['summary']['failed'] else 0


if __name__ == '__main__':
    sys.exit(main())
