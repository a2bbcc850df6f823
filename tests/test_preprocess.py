"""Preprocessing unit tests: shard math, alignment, face warp vs cv2."""
import numpy as np
import pytest

from fvt_tpu.preprocess import sharding as S
from fvt_tpu.preprocess import textalign as TA
from fvt_tpu.preprocess import facealign as FA


def test_divide_matches_more_itertools():
    import more_itertools as mit
    for n, length in [(3, 10), (5, 5), (7, 23), (4, 2)]:
        seq = list(range(length))
        want = [list(c) for c in mit.divide(n, seq)]
        got = S.divide(n, seq)
        assert got == want


def test_chunks_into_n():
    l = list(range(10))
    got = [list(c) for c in S.chunks_into_n(l, 3)]
    assert got == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    got = S.better_chunks_into_n(l, 3)
    assert [len(c) for c in got] == [4, 3, 3]
    assert sum(got, []) == l


def test_annotated_index_identity_and_resample():
    idx = S.annotated_index(10, 25.0)
    np.testing.assert_array_equal(idx, np.arange(10))
    idx = S.annotated_index(10, 25.0, target_frequency=100.0)
    np.testing.assert_array_equal(idx, np.round(4.0 * np.arange(10)))


def test_align_word_embedding_blocks():
    emb = np.arange(3)[:, None] * np.ones((3, 768), dtype=np.float32)
    idx = np.arange(7)
    out = TA.align_word_embedding_new(emb, idx)
    # 7 frames into 3 blocks: sizes 3,2,2 (mit.divide)
    want_token = [0, 0, 0, 1, 1, 2, 2]
    np.testing.assert_array_equal(out[:, 0], want_token)

    # more tokens than frames: extra tokens truncated
    emb5 = np.arange(5)[:, None] * np.ones((5, 768), dtype=np.float32)
    out = TA.align_word_embedding_new(emb5, np.arange(3))
    np.testing.assert_array_equal(out[:, 0], [0, 1, 2])

    # no embedding -> zeros (missing transcript, speech.py:735-738)
    out = TA.align_word_embedding_new(
        np.zeros((0, 768), np.float32), np.arange(4))
    assert (out == 0).all()


def test_split_sentences_fallback():
    s = TA.split_sentences("Hello there. How are you? Fine!")
    assert len(s) == 3


def test_similarity_transform_roundtrip():
    rng = np.random.default_rng(0)
    # a known similarity: scale .8, rot 20deg, translation (5, -3)
    th = np.deg2rad(20)
    A = 0.8 * np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]])
    src = rng.uniform(0, 100, size=(5, 2))
    dst = src @ A.T + np.array([5.0, -3.0])
    tfm = FA.similarity_transform(src, dst)
    got = np.hstack([src, np.ones((5, 1))]) @ tfm.T
    np.testing.assert_allclose(got, dst, atol=1e-6)


def test_warp_affine_matches_cv2():
    cv2 = pytest.importorskip('cv2')
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(80, 60, 3)).astype(np.uint8)
    pts = np.array([[20, 30], [40, 28], [31, 45], [24, 55], [38, 54]],
                   dtype=np.float32)
    ref = FA.get_reference_facial_points(default_square=True) * (64 / 112.)
    tfm = FA.similarity_transform(pts, ref)

    want = cv2.warpAffine(img, tfm, (64, 64))
    got = FA.warp_affine(img, tfm, (64, 64))
    # cv2 uses 5-bit fixed-point bilinear; allow small quantization diffs
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.median(diff) <= 1
    assert (diff <= 3).mean() > 0.97, (diff > 3).mean()


def test_batched_warp_matches_single():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(4, 70, 70, 3)).astype(np.uint8)
    lms = np.stack([
        np.array([[20, 30], [40, 28], [31, 45], [24, 55], [38, 54]])
        + rng.normal(scale=2, size=(5, 2)) for _ in range(4)]).astype(
            np.float32)
    batched = FA.batched_warp_faces(frames, lms, out_size=64)
    for t in range(4):
        single = FA.warp_and_crop_face(frames[t], lms[t],
                                       crop_size=(64, 64))
        np.testing.assert_allclose(batched[t].astype(int),
                                   single.astype(int), atol=1)


def test_mfcc_shape_and_deltas(tmp_path):
    import wave
    from fvt_tpu.preprocess import mfcc as MF
    rng = np.random.default_rng(5)
    sr = 16000
    wav = (rng.normal(size=(sr * 2,)) * 6000).astype(np.int16)
    p = str(tmp_path / 'm.wav')
    with wave.open(p, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(wav.tobytes())

    feats = MF.mfcc(wav / 32768.0)
    assert feats.shape[1] == 39           # 13 + delta + delta-delta
    assert abs(feats.shape[0] - 198) <= 2  # ~100 Hz frame rate

    out = str(tmp_path / 'mfcc.npy')
    MF.extract_mfcc(p, out, annotated_idx=np.arange(50))
    assert np.load(out).shape == (50, 39)

    # opensmile is absent in this image -> the native eGeMAPS fallback
    # produces the whole-file 88-d functional vector
    ege = str(tmp_path / 'ege.npy')
    MF.extract_egemaps(p, ege)
    assert np.load(ege).shape == (1, 88)
