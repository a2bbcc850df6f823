"""Pluggable face-detector contract for the crop/align pipeline.

The reference runs RetinaFace (retinaface_align.py:64-284); that package
is absent here, so fvt_tpu defines a detector CONTRACT — ``detect(rgb)
-> [{'bbox', 'score', 'landmarks'(5,2)}, ...] sorted by score desc`` —
with RetinaFace/Haar/center-box implementations selected at runtime
(preprocess/faces.py:36-138).  These tests pin the contract with an
injected fake detector so any implementation (including a future
weight-ported one) slots in: landmark consumption by the 5-pt warp,
previous-frame carry on detection failure (c_expr_db.py:384-392), and
the leading-failure full-frame fallback.
"""
import os

import numpy as np
import pytest

from fvt_tpu.preprocess import faces

cv2 = pytest.importorskip('cv2')


def _write_video(path, frames, fps=5):
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'MJPG'), fps, (w, h))
    assert vw.isOpened(), 'cv2 VideoWriter unavailable'
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


def _frames(n=6, size=96):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        f = np.full((size, size, 3), 30 + 20 * i, np.uint8)
        f[20:70, 25:75] = [200, 150 + 5 * i, 100]  # the "face"
        f += rng.integers(0, 8, f.shape).astype(np.uint8)
        out.append(f)
    return out


def _box_lms():
    return faces._box_landmarks(25, 20, 50, 50)


class FakeDetector:
    """Minimal contract implementation; records every call."""

    def __init__(self, hit_frames):
        self.hit_frames = set(hit_frames)
        self.calls = 0

    def detect(self, img_rgb):
        i, self.calls = self.calls, self.calls + 1
        if i not in self.hit_frames:
            return []
        return [{'bbox': np.array([25, 20, 75, 70], np.float32),
                 'score': 0.99, 'landmarks': _box_lms()}]


@pytest.fixture()
def video(tmp_path):
    frames = _frames()
    path = str(tmp_path / 'clip.avi')
    _write_video(path, frames)
    return path, frames


def test_injected_detector_drives_the_warp(video, tmp_path):
    path, frames = video
    det = FakeDetector(hit_frames=range(len(frames)))
    out = faces.process_one_video(path, str(tmp_path / 'crops'),
                                  detector=det)
    assert det.calls == len(frames)
    assert out.shape == (len(frames), faces.OUT_SIZE, faces.OUT_SIZE, 3)
    assert out.dtype == np.uint8
    # the warp output must be dominated by the detected face region's
    # color, not the dark background
    assert out.reshape(len(frames), -1, 3).mean(axis=1)[0][0] > 90
    # per-frame jpgs + frame log: one detection per frame
    log = open(str(tmp_path / 'crops' / 'frames.log')).read().splitlines()
    assert [line.split(',')[1] for line in log] == ['1'] * len(frames)
    assert os.path.isfile(str(tmp_path / 'crops' / 'frame-0' / 'face-0.jpg'))


def test_prev_frame_carry_on_detection_failure(video, tmp_path):
    """Reference semantics (c_expr_db.py:384-392): a failed frame stores
    a COPY of the previous frame's cropped face — not a re-warp of the
    current frame with stale landmarks."""
    path, frames = video
    det = FakeDetector(hit_frames={0, 1})  # frames 2.. fail
    out = faces.process_one_video(path, str(tmp_path / 'c'), detector=det,
                                  store_jpgs=False)
    for i in range(2, len(frames)):
        np.testing.assert_array_equal(out[i], out[1])
    assert not np.array_equal(out[0], out[1]) or \
        np.array_equal(frames[0], frames[1])


def test_leading_failures_fall_back_to_full_frame(video, tmp_path):
    path, frames = video
    det = FakeDetector(hit_frames=())
    out = faces.process_one_video(path, str(tmp_path / 'c'), detector=det,
                                  store_jpgs=False)
    # decode round-trip (MJPG) is lossy; compare against the decoded frame
    decoded = list(faces.read_video_frames(path))
    want = cv2.resize(decoded[0], (faces.OUT_SIZE, faces.OUT_SIZE))
    np.testing.assert_array_equal(out[0], want)


def test_default_detector_satisfies_the_contract():
    det = faces.default_detector()
    rgb = _frames(1)[0]
    dets = det.detect(rgb)
    for d in dets:
        assert set(d) >= {'bbox', 'score', 'landmarks'}
        assert np.asarray(d['landmarks']).shape == (5, 2)
    scores = [d['score'] for d in dets]
    assert scores == sorted(scores, reverse=True)


def test_crop_faces_align_sharded_cli(tmp_path):
    """Fold-level sharded crop driver (c_expr_db.py:407-463, __main__
    :828-864): block math covers every video exactly once across
    blocks, per-block logs use the reference's naming, corrupt/missing
    videos are logged-and-skipped, and re-runs are idempotent."""
    folds_dir = tmp_path / 'folds'
    (folds_dir / 'split-0').mkdir(parents=True)
    vids = tmp_path / 'trimmed'
    vids.mkdir()
    trials = ['a', 'b', 'c']
    for t in trials:
        _write_video(str(vids / f'{t}.avi'), _frames(4))
    lines = [f'{t},{i},hello {t}' for i, t in enumerate(trials)]
    lines.append('ghost,3,no file on disk')  # missing video
    (folds_dir / 'split-0' / 'train.txt').write_text('\n'.join(lines) + '\n')

    out_root = str(tmp_path / 'cropped_aligned')
    done = []
    for blk in range(2):
        done += faces.crop_faces_align(
            str(folds_dir), str(vids), out_root, 'train',
            nblocks=2, process_block=blk,
            detector=FakeDetector(hit_frames=range(100)),
            video_ext='.avi')
    assert sorted(done) == trials  # each video processed exactly once

    for t in trials:
        assert (tmp_path / 'cropped_aligned' / t / 'frames.log').is_file()
        assert (tmp_path / 'cropped_aligned' / t / 'frame-0' /
                'face-0.jpg').is_file()

    logs = sorted(os.listdir(out_root + '-logs'))
    assert logs == ['log-nblocks-2-process-block-0.txt',
                    'log-nblocks-2-process-block-1.txt'], logs
    joined = ''.join(
        open(os.path.join(out_root + '-logs', f)).read() for f in logs)
    assert 'XXXX MISSING' in joined  # the ghost video is diagnosable

    # idempotent: a re-run of block 0 skips, not re-crops
    redo = faces.crop_faces_align(
        str(folds_dir), str(vids), out_root, 'train',
        nblocks=2, process_block=0,
        detector=FakeDetector(hit_frames=range(100)), video_ext='.avi')
    assert redo  # still reports its trials as covered
    assert 'SKIP (already cropped)' in open(os.path.join(
        out_root + '-logs', 'log-nblocks-2-process-block-0.txt')).read()
