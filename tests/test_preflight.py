"""tools/preflight.py: the external-resource harness must (a) report
absent resources as absent-not-failed, and (b) when a resource IS
present (faked here with a randomly-initialized state_dict standing in
for the published ``vggish.pth``), actually run the torch-reference-vs-
fvt-port numerics check and pass it.

Matches the r3 verdict's 'external-resource preflight' work item: the
day `/root/reference`'s weight files (configs.py:140,
models/backbone.py:16-66) appear, one command validates the ports.
"""
import json
import os
import subprocess
import sys
from os.path import join

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, join(REPO, 'tools'))

import preflight  # noqa: E402


def test_all_absent_is_ok(tmp_path, monkeypatch):
    for var in ('FVT_ARCFACE_WEIGHTS', 'FVT_VGGISH_WEIGHTS',
                'FVT_RETINAFACE_WEIGHTS', 'FVT_FAN_WEIGHTS'):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv('TORCH_HOME', str(tmp_path / 'empty_hub'))
    report = preflight.run_all()
    for name in ('arcface', 'vggish', 'retinaface', 'fan'):
        assert report[name] == {'present': False}
    assert report['summary']['failed'] == []


def test_env_var_pointing_at_missing_file_raises(monkeypatch):
    monkeypatch.setenv('FVT_VGGISH_WEIGHTS', '/nonexistent/vggish.pth')
    with pytest.raises(FileNotFoundError):
        preflight._weights('FVT_VGGISH_WEIGHTS', 'vggish.pth')


def test_fan_env_var_pointing_at_missing_file_fails_loudly(monkeypatch):
    """All four weight resources honor the same env-var contract: an
    explicitly-set path that doesn't exist is a FAILURE, not 'absent'."""
    from fvt_tpu.preprocess import fan
    monkeypatch.setenv('FVT_FAN_WEIGHTS', '/nonexistent/2DFAN4.zip')
    with pytest.raises(FileNotFoundError):
        fan._default_weights_path()
    report = preflight.run_all()
    assert report['fan']['ok'] is False
    assert 'fan' in report['summary']['failed']


def test_fake_fan_weights_run_the_native_check(tmp_path, monkeypatch):
    """A synthetic FAN state dict must flow through the weights-PRESENT
    path of check_fan (this path once crashed on a stale symbol name
    that the absent/missing-file tests never reached)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import numpy as np
    from test_fan import synth_state_dict

    sd = synth_state_dict(np.random.default_rng(5))
    path = str(tmp_path / 'fan_sd.npz')
    np.savez(path, **sd)
    monkeypatch.setenv('FVT_FAN_WEIGHTS', path)

    res = preflight.check_fan()
    assert res['present'] and res['ok'], res
    assert res['native_landmarks'] == 68


def test_fake_retinaface_torch_save_loads(tmp_path, monkeypatch):
    """check_retinaface's weights-present path on a torch-saved .pth
    (the published file's format; the old non-zip pickle fallback
    returned a magic-number int on legacy archives)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import numpy as np
    import torch
    from test_retinaface import synth_state_dict

    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in synth_state_dict(scale=1e-4).items()}
    path = str(tmp_path / 'retinaface_resnet50_2020-07-20.pth')
    torch.save(sd, path)
    monkeypatch.setenv('FVT_RETINAFACE_WEIGHTS', path)

    res = preflight.check_retinaface()
    assert res['present'], res
    # near-zero synthetic weights score every anchor ~0.5, below the 0.9
    # threshold: zero detections must read as a FAILURE with a pointer
    # to FVT_PREFLIGHT_IMAGE, not a vacuous ok (a broken port would
    # also detect nothing)
    assert res['native_detections'] == 0
    assert res['ok'] is False and 'FVT_PREFLIGHT_IMAGE' in res['reason']


def test_fake_vggish_weights_run_the_parity_check(tmp_path, monkeypatch):
    """A random-init reference VGGish saved as a .pth must flow through
    the REAL check: torch load -> port -> forward comparison."""
    import torch
    from conftest import add_reference_to_path
    add_reference_to_path()
    from models.backbone import VGGish as RefVGGish

    torch.manual_seed(0)
    path = str(tmp_path / 'vggish.pth')
    torch.save(RefVGGish().state_dict(), path)
    monkeypatch.setenv('FVT_VGGISH_WEIGHTS', path)

    res = preflight.check_vggish()
    assert res['present'] and res['ok']
    assert res['source'] == path
    assert res['max_abs_delta'] < 2e-4


def test_cli_writes_report(tmp_path, monkeypatch):
    monkeypatch.delenv('FVT_VGGISH_WEIGHTS', raising=False)
    out = str(tmp_path / 'report.json')
    env = dict(os.environ, TORCH_HOME=str(tmp_path / 'empty_hub'))
    env.pop('FVT_VGGISH_WEIGHTS', None)
    r = subprocess.run(
        [sys.executable, join(REPO, 'tools', 'preflight.py'),
         '--out', out], env=env, capture_output=True, text=True,
        timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    with open(out) as f:
        report = json.load(f)
    assert set(preflight.CHECKS) <= set(report)
    assert 'summary' in report
