"""Offline CNN feature extraction + face-compaction CLI."""
import os
from os.path import join

import numpy as np
import jax
import jax.numpy as jnp

from fvt_tpu.models.arcface import VisualBackbone
from fvt_tpu.preprocess.visual import extract_cnn_features


def test_extract_cnn_features_matches_direct():
    model = VisualBackbone()
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, size=(10, 64, 64, 3)).astype(np.uint8)

    from fvt_tpu.data.transforms import eval_video_transform
    x = eval_video_transform(jnp.asarray(video[None], jnp.float32))[0]
    variables = jax.jit(lambda r, a: model.init(r, a, train=False))(
        jax.random.key(0), x)
    want = np.asarray(model.apply(variables, x, train=False))

    got = extract_cnn_features(video, variables['params'],
                               variables.get('batch_stats', {}), batch=4)
    assert got.shape == (10, 512)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_compact_cli(tmp_path):
    from PIL import Image
    from fvt_tpu.preprocess.compact import main

    rng = np.random.default_rng(1)
    faces_root = str(tmp_path / 'cropped')
    feat_root = str(tmp_path / 'features')
    trial = 'train/vidA'
    n = 5
    for i in range(n):
        d = join(faces_root, trial, f'frame-{i}')
        os.makedirs(d)
        img = rng.integers(0, 255, size=(256, 256, 3)).astype(np.uint8)
        Image.fromarray(img).save(join(d, 'face-0.jpg'))
    tdir = join(feat_root, trial)
    os.makedirs(tdir)
    np.save(join(tdir, 'vggish.npy'), np.zeros((7, 128), np.float32))
    np.save(join(tdir, 'EXPR_continuous_label.npy'),
            np.zeros((n,), np.int64))

    main(['--faces_root', faces_root, '--features_root', feat_root,
          '--split', 'train'])

    video = np.load(join(tdir, 'video.npy'))
    assert video.shape == (n, 256, 256, 3) and video.dtype == np.uint8
    assert video.any()  # jpgs actually loaded
    # longer vggish got truncated to the frame count
    assert np.load(join(tdir, 'vggish.npy')).shape[0] == n
