"""Sharded preprocessing driver + merge + face compaction, end to end."""
import os
from os.path import join

import numpy as np
import pytest
import yaml

from fvt_tpu import constants
from fvt_tpu.preprocess.driver import PreprocessingDriver
from fvt_tpu.preprocess.merge import merge_results
from fvt_tpu.preprocess import faces as faces_mod


def _write_video(path, n_frames=12, size=64, fps=25):
    cv2 = pytest.importorskip('cv2')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*'MJPG')
    w = cv2.VideoWriter(path, fourcc, fps, (size, size))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(n_frames):
        w.write(rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8))
    w.release()


@pytest.fixture(scope='module')
def video_store(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('videos'))
    folds = join(root, 'folds', 'split-0')
    os.makedirs(folds, exist_ok=True)
    lines = []
    for i in range(4):
        trial = f'train/clip{i}'
        _write_video(join(root, 'raw', trial + '.avi'), n_frames=10 + i)
        lines.append(f'{trial},{i % 7},hello world clip {i}')
    with open(join(folds, 'train.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    with open(join(folds, 'class_id.yaml'), 'w') as f:
        yaml.dump({c: i for i, c in enumerate(
            ['a', 'b', 'c', 'd', 'e', 'f', 'g'])}, f)
    return root


def test_sharded_driver_and_merge(video_store, tmp_path):
    out_root = str(tmp_path / 'out')
    for part in range(2):
        drv = PreprocessingDriver(
            constants.MELD, constants.TRAINSET, part=part, nparts=2,
            video_root=join(video_store, 'raw'),
            output_root=out_root,
            folds_dir=join(video_store, 'folds'))
        records = drv.run()
        assert len(records) == 2  # 4 trials over 2 parts

    feat = join(out_root, 'features')
    info = merge_results(feat, constants.MELD, constants.TRAINSET)
    assert len(info['trial']) == 4
    assert info['data_folder'] == 'compacted_48'
    assert sorted(info['trial']) == [f'train/clip{i}' for i in range(4)]

    # per-trial store: labels broadcast + zero-bert alignment
    tdir = join(feat, 'compacted_48', 'train/clip0')
    labels = np.load(join(tdir, 'EXPR_continuous_label.npy'))
    assert labels.shape == (10,) and (labels == 0).all()
    bert = np.load(join(tdir, 'bert.npy'))
    assert bert.shape == (10, 768)

    # the merged master pickle actually satisfies the Experiment
    # schema: every key the loaders consume, per-trial aligned,
    # globally-unique subject ids across shards
    required = {'trial', 'trial_no', 'subject_no', 'length',
                'partition', 'pseudo_partition', 'data_folder'}
    assert required <= set(info)
    n = len(info['trial'])
    for k in ('trial_no', 'subject_no', 'length', 'partition',
              'pseudo_partition'):
        assert len(info[k]) == n, k
    assert len(set(info['subject_no'])) == n  # no shard collisions
    assert all(length > 0 for length in info['length'])


def test_face_pipeline_and_compaction(video_store, tmp_path):
    vpath = join(video_store, 'raw', 'train/clip0.avi')
    out_dir = str(tmp_path / 'faces')
    faces = faces_mod.process_one_video(
        vpath, out_dir, detector=faces_mod.CenterBoxDetector(),
        store_jpgs=True)
    assert faces.shape == (10, 256, 256, 3)
    assert faces.dtype == np.uint8
    assert os.path.isfile(join(out_dir, 'frames.log'))
    assert os.path.isfile(join(out_dir, 'frame-0', 'face-0.jpg'))

    # compaction reconciles longer feature arrays by truncation
    tdir = str(tmp_path / 'trial')
    os.makedirs(tdir, exist_ok=True)
    np.save(join(tdir, 'vggish.npy'), np.zeros((12, 128), np.float32))
    np.save(join(tdir, 'EXPR_continuous_label.npy'),
            np.zeros((10,), np.int64))
    faces_mod.compact_video_npy(tdir, faces)
    assert np.load(join(tdir, 'video.npy')).shape == (10, 256, 256, 3)
    assert np.load(join(tdir, 'vggish.npy')).shape[0] == 10


def test_transcriber_chain_step(video_store, tmp_path):
    """A trial with NO fold transcript gets transcribed (injectable
    transcriber), punctuated, embedded and frame-aligned — the reference
    chain base/preprocessing.py:381-415. Trials WITH fold transcripts
    never invoke the transcriber."""
    import yaml as _yaml
    from fvt_tpu.preprocess import textalign

    root = str(tmp_path / 'nv')
    folds = join(root, 'folds', 'split-0')
    os.makedirs(folds, exist_ok=True)
    _write_video(join(root, 'raw', 'train/silent.avi'), n_frames=10)
    _write_video(join(root, 'raw', 'train/spoken.avi'), n_frames=10)
    with open(join(folds, 'train.txt'), 'w') as f:
        f.write('train/silent,0,\n')          # no transcript
        f.write('train/spoken,1,from fold\n')  # fold transcript present
    with open(join(folds, 'class_id.yaml'), 'w') as f:
        _yaml.dump({c: i for i, c in enumerate('abcdefg')}, f)

    calls = []

    def fake_transcriber(wav_path):
        calls.append(wav_path)
        return 'three words here'

    def fake_embedder(transcript):
        # one distinct embedding per word
        words = transcript.split()
        emb = np.zeros((len(words), 768), np.float32)
        for i in range(len(words)):
            emb[i, i] = float(i + 1)
        return emb

    out_root = str(tmp_path / 'nv_out')
    drv = PreprocessingDriver(
        constants.MELD, constants.TRAINSET, part=0, nparts=1,
        video_root=join(root, 'raw'), output_root=out_root,
        folds_dir=join(root, 'folds'),
        transcriber=fake_transcriber, text_embedder=fake_embedder)

    # the transcriber contract reads from the wav the driver produced; if
    # ffmpeg is absent, plant the wav file so the chain step still runs
    from fvt_tpu.preprocess import audio as audio_mod
    if not audio_mod.has_ffmpeg():
        for t in ('train/silent', 'train/spoken'):
            w = join(out_root, 'features', 'wav', t + '.wav')
            os.makedirs(os.path.dirname(w), exist_ok=True)
            open(w, 'wb').close()

    records = drv.run()
    recs = {r['processing_record']['trial']: r['processing_record']
            for r in records}

    # only the transcript-less trial was transcribed
    assert len(calls) == 1 and calls[0].endswith('train/silent.wav')
    assert recs['train/silent'].get('transcript') == 'three words here'
    assert 'transcript' not in recs['train/spoken']

    # bert.npy holds the aligned fake embeddings: 10 frames over 3 tokens
    bert = np.load(join(out_root, 'features', 'compacted_48',
                        'train/silent', 'bert.npy'))
    fps = recs['train/silent']['fps']
    from fvt_tpu.preprocess.sharding import annotated_index
    ann = annotated_index(10, fps)
    want = textalign.align_word_embedding_new(fake_embedder(
        'three words here'), ann)
    np.testing.assert_array_equal(bert, want)
    assert bert.any(), 'alignment produced all-zero embeddings'

    # the fold-transcript trial used the embedder on the fold text
    bert2 = np.load(join(out_root, 'features', 'compacted_48',
                         'train/spoken', 'bert.npy'))
    assert bert2.shape == (10, 768) and bert2.any()


def test_optional_audio_feature_steps(video_store, tmp_path):
    """--mfcc / --egemaps driver gates (the reference's extract_mfcc /
    extract_egemaps chain steps, base/preprocessing.py:280-285 +
    project/abaw5/configs.py:146-148): mfcc.npy (length, 39) and
    egemaps.npy (length, 88) appear per trial, aligned to the annotated
    frame index like every compacted audio feature."""
    import wave as wave_mod

    out_root = str(tmp_path / 'af_out')
    drv = PreprocessingDriver(
        constants.MELD, constants.TRAINSET, part=0, nparts=1,
        video_root=join(video_store, 'raw'), output_root=out_root,
        folds_dir=join(video_store, 'folds'),
        extract_mfcc=True, extract_egemaps=True)

    # no ffmpeg in this image: plant real 16 kHz wavs where the wav
    # conversion step would have written them
    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.3 * np.sin(2 * np.pi * 220.0 * t) * 32767).astype(np.int16)
    for i in range(4):
        w = join(out_root, 'features', 'wav', f'train/clip{i}.wav')
        os.makedirs(os.path.dirname(w), exist_ok=True)
        with wave_mod.open(w, 'wb') as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(tone.tobytes())

    records = drv.run()
    assert len(records) == 4
    for i, rec in enumerate(records):
        pr = rec['processing_record']
        assert not [s for s in pr['issues']
                    if 'mfcc' in s or 'egemaps' in s], pr['issues']
        tdir = join(out_root, 'features', 'compacted_48',
                    f'train/clip{i}')
        n = pr['length']
        mf = np.load(join(tdir, 'mfcc.npy'))
        eg = np.load(join(tdir, 'egemaps.npy'))
        assert mf.shape == (n, 39) and np.isfinite(mf).all()
        assert eg.shape == (n, 88) and np.isfinite(eg).all()
        # a 220 Hz tone is voiced: the F0 functional column is live
        from fvt_tpu.preprocess.egemaps import COLUMNS
        f0col = COLUMNS.index('F0semitoneFrom27.5Hz_sma3nz_amean')
        assert abs(eg[0, f0col] - 36.0) < 1.0


def test_landmark_chain_step(video_store, tmp_path):
    """The gated landmark.npy step (reference extract_facial_landmark_fn,
    base/preprocessing.py:631-648): one (68, 2) landmark set per
    compacted face frame, stored as the FacenetController csv layout
    x_0..x_67 then y_0..y_67 (video.py:249-292), zeros when the
    landmarker fails on a frame.  Runs only when video.npy exists (the
    crop+compact pass precedes feature extraction)."""
    out_root = str(tmp_path / 'out_lm')

    # crop+compact pass first, like the real pipeline order
    feat_dir = join(out_root, 'features', 'compacted_48')
    for i in range(4):
        trial = f'train/clip{i}'
        tdir = join(feat_dir, trial)
        os.makedirs(tdir, exist_ok=True)
        n = 10 + i
        np.save(join(tdir, 'video.npy'),
                np.zeros((n, 32, 32, 3), np.uint8))

    calls = []

    def fake_landmarker(face):
        calls.append(face.shape)
        if len(calls) == 3:
            raise RuntimeError('detector blinked')  # per-frame degrade
        lm = np.zeros((68, 2), np.float32)
        lm[:, 0] = np.arange(68)            # x block
        lm[:, 1] = 100.0 + np.arange(68)    # y block
        return lm

    drv = PreprocessingDriver(
        constants.MELD, constants.TRAINSET, part=0, nparts=1,
        video_root=join(video_store, 'raw'),
        output_root=out_root,
        folds_dir=join(video_store, 'folds'),
        landmarker=fake_landmarker)
    drv.run()

    lm = np.load(join(feat_dir, 'train/clip0', 'landmark.npy'))
    assert lm.shape == (10, 136) and lm.dtype == np.float32
    np.testing.assert_array_equal(lm[0, :68], np.arange(68))   # x first
    np.testing.assert_array_equal(lm[0, 68:], 100 + np.arange(68))
    assert (lm[2] == 0).all()  # the blinked frame degrades to zeros
    assert (lm[[0, 1, 3]] != 0).any(axis=1).all()
    assert calls[0] == (32, 32, 3)

    # idempotent: a second pass never re-invokes the landmarker
    n_calls = len(calls)
    drv.run()
    assert len(calls) == n_calls


def test_landmark_modality_trains(tmp_path):
    """'landmark' is a usable 136-d feature modality: the reference
    defines its TCN encoder (configs.py:117) but omits it from the
    dataset multiplier, so it was never loadable there; with the
    driver's --landmarks producer and the multiplier entry, a store
    carrying landmark.npy drives a CAN epoch + inference end to end."""
    from types import SimpleNamespace
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_store import make_meld_store
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment

    root = str(tmp_path / 'lmstore')
    store = make_meld_store(root, n_train=6, n_val=3, n_test=3,
                            min_len=6, max_len=12)
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(7, 136)) * 3.0
    feat_dir = join(root, 'features', 'compacted_48')
    for split_dir in sorted(os.listdir(feat_dir)):
        for v in sorted(os.listdir(join(feat_dir, split_dir))):
            tdir = join(feat_dir, split_dir, v)
            lab_arr = np.load(join(tdir, 'EXPR_continuous_label.npy'))
            lab, n = int(lab_arr[0]), len(lab_arr)
            np.save(join(tdir, 'landmark.npy'),
                    (centers[lab] + rng.normal(size=(n, 136))
                     ).astype(np.float32))

    cfg = get_config('MELD')
    cfg.update(dataset_path=store['dataset_path'],
               folds_dir=store['folds_dir'],
               model_name=constants.CAN,
               modality='landmark+bert+EXPR_continuous_label',
               window_length=16, hop_length=8,
               train_batch_size=4, eval_bucket_quantum=8,
               num_workers=1, calc_mean_std=True, seed=0,
               outd=str(tmp_path / 'lm_out'))
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
