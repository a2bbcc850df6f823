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

    # MELD (the default --ds) hard-asserts length agreement at
    # compaction like the reference (compact_face_images.py:248) — the
    # MELD arranger trusts dataset_info's recorded length, so a silent
    # truncation would crash the loader epochs later
    import pytest
    with pytest.raises(AssertionError, match='vggish'):
        main(['--faces_root', faces_root, '--features_root', feat_root,
              '--split', 'train'])
    os.remove(join(tdir, 'video.npy'))  # strict run wrote video first

    # C-EXPR-DB* reconciles by truncation
    main(['--faces_root', faces_root, '--features_root', feat_root,
          '--split', 'train', '--ds', 'C-EXPR-DB'])

    video = np.load(join(tdir, 'video.npy'))
    assert video.shape == (n, 256, 256, 3) and video.dtype == np.uint8
    assert video.any()  # jpgs actually loaded
    # longer vggish got truncated to the frame count
    assert np.load(join(tdir, 'vggish.npy')).shape[0] == n


def test_cnn_modality_trains(tmp_path):
    """'cnn' (offline ArcFace embeddings, the reference's feed-CNN-
    instead-of-raw-video option: configs.py TCN settings 'cnn',
    preprocess visual.py cnn.npy) drives a CAN epoch + inference as a
    first-class 512-d modality."""
    import os
    from os.path import join
    from types import SimpleNamespace

    import numpy as np

    from fvt_tpu import constants
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment
    from synth_store import make_meld_store

    root = str(tmp_path / 'cnnstore')
    store = make_meld_store(root, n_train=6, n_val=3, n_test=3,
                            min_len=6, max_len=12)
    rng = np.random.default_rng(4)
    centers = rng.normal(size=(7, 512)) * 3.0
    feat_dir = join(root, 'features', 'compacted_48')
    for split_dir in sorted(os.listdir(feat_dir)):
        for v in sorted(os.listdir(join(feat_dir, split_dir))):
            tdir = join(feat_dir, split_dir, v)
            lab_arr = np.load(join(tdir, 'EXPR_continuous_label.npy'))
            lab, n = int(lab_arr[0]), len(lab_arr)
            np.save(join(tdir, 'cnn.npy'),
                    (centers[lab] + rng.normal(size=(n, 512))
                     ).astype(np.float32))

    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               model_name=constants.CAN,
               modality='cnn+bert+EXPR_continuous_label',
               window_length=16, hop_length=8,
               train_batch_size=4, eval_bucket_quantum=8,
               num_workers=1, calc_mean_std=True, seed=0,
               outd=str(tmp_path / 'cnn_out'))
    args = SimpleNamespace(**cfg)

    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    trainer = exp.init_trainer()
    trainer.init_state(exp._sample_batch(loaders))
    loss = trainer.train_one_epoch(loaders[constants.TRAINSET], 0)
    assert np.isfinite(loss)
    perf, per_video = trainer.inference(loaders[constants.VALIDSET])
    assert len(per_video) == 3
    for v, d in per_video.items():
        assert d['logits'].shape[1] == 7, (v, d['logits'].shape)
