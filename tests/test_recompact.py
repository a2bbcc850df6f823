"""Re-compaction of raw video stores to transform scale (video_48.npy)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from fvt_tpu.data.dataset import ExampleBuilder
from fvt_tpu.preprocess import recompact


def _trial(tmp_path, n=12, hw=256, name='t0'):
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(hash(name) % 2**32)
    video = rng.integers(0, 256, size=(n, hw, hw, 3)).astype(np.uint8)
    np.save(os.path.join(d, 'video.npy'), video)
    np.save(os.path.join(d, 'EXPR_continuous_label.npy'),
            np.zeros((n,), np.int64))
    return d, video


def test_recompact_then_build_is_identical(tmp_path):
    d, video = _trial(tmp_path)
    item = [d, 't0', 12, np.arange(12)]
    builder = ExampleBuilder(['video'], window_length=8)
    before = builder.build(item)['video']

    dst = recompact.recompact_trial(d)
    assert dst and dst.endswith('video_48.npy')
    small = np.load(dst)
    assert small.shape == (12, 48, 48, 3) and small.dtype == np.uint8

    after = builder.build(item)['video']
    np.testing.assert_array_equal(before, after)

    # idempotent: second run skips
    assert recompact.recompact_trial(d) is None

    # eval center-crop path (the bench loader leg): the recompacted
    # store takes the plain-slice crop branch; must equal the fused
    # native-resize crop of the 256^2 source
    os.remove(dst)
    before_c = builder.build(item, center_crop=40)['video']
    assert recompact.recompact_trial(d)
    after_c = builder.build(item, center_crop=40)['video']
    assert after_c.shape[1:3] == (40, 40)
    np.testing.assert_array_equal(before_c, after_c)


def test_stale_recompacted_file_is_ignored(tmp_path):
    """CONTENT-sensitive: after the source is rewritten (truncated OR
    same-frame-count with different pixels), builds must serve the
    fresh resize, not the stale video_48.npy."""
    from fvt_tpu.data.host_resize import resize_frames_uint8

    d, video = _trial(tmp_path, name='t1')
    recompact.recompact_trial(d)

    # rewrite with the SAME frame count but different content (the
    # frame-count guard alone cannot catch this; mtime must)
    rng = np.random.default_rng(99)
    video2 = rng.integers(0, 256, size=video.shape).astype(np.uint8)
    np.save(os.path.join(d, 'video.npy'), video2)
    item = [d, 't1', len(video2), np.arange(len(video2))]
    out = ExampleBuilder(['video'], window_length=4).build(item)['video']
    want = resize_frames_uint8(video2, 48)
    assert np.abs(out.astype(np.int32) - want.astype(np.int32)).max() <= 1

    # truncating rewrite: frame-count guard path
    np.save(os.path.join(d, 'video.npy'), video2[:7])
    item = [d, 't1', 7, np.arange(7)]
    out = ExampleBuilder(['video'], window_length=4).build(item)['video']
    want = resize_frames_uint8(video2[:7], 48)
    assert out.shape == (7, 48, 48, 3)
    assert np.abs(out.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_cli_shards_and_reports(tmp_path):
    for k in range(3):
        _trial(tmp_path, n=6, name=f'vid{k}')
    env = dict(os.environ)
    env['PYTHONPATH'] = '/root/repo:' + env.get('PYTHONPATH', '')
    env['JAX_PLATFORMS'] = 'cpu'
    outs = []
    for part in range(2):
        r = subprocess.run(
            [sys.executable, '-m', 'fvt_tpu.preprocess.recompact',
             '--features_path', str(tmp_path),
             '--part', str(part), '--nparts', '2'],
            capture_output=True, text=True, env=env, timeout=300)
        assert r.returncode == 0, r.stderr[-500:]
        outs.append(r.stdout)
    assert sum(int(o.split()[1]) for o in outs) == 3
    for k in range(3):
        assert os.path.isfile(str(tmp_path / f'vid{k}' / 'video_48.npy'))
