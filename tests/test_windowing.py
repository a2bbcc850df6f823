"""Windowing / stitch parity with the reference index math."""
import numpy as np
import pytest

from fvt_tpu.data import windowing as W


def ref_windowing(x, window_length, hop_length, strict_greater=True):
    """Reference rule (base/dataset.py:434-453 / trainer.py:894-912),
    re-derived here as an independent oracle."""
    _length = len(x)
    cond = _length > window_length if strict_greater \
        else _length >= window_length
    if cond:
        steps = (_length - window_length) // hop_length + 1
        sampled = [x[i * hop_length:i * hop_length + window_length]
                   for i in range(steps)]
        if sampled[-1][-1] < _length - 1:
            sampled.append(x[-window_length:])
    else:
        sampled = [x]
    return sampled


@pytest.mark.parametrize('length', [1, 5, 299, 300, 301, 499, 500, 501,
                                    700, 899, 900, 1234, 4321])
@pytest.mark.parametrize('win,hop', [(300, 200), (300, 300), (10, 3)])
def test_windowing_matches_reference(length, win, hop):
    x = np.arange(length)
    got = W.windowing(x, win, hop)
    want = ref_windowing(x, win, hop)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_window_index_matrix_matches_lists():
    length, win, hop = 1234, 300, 200
    mat = W.window_index_matrix(length, win, hop)
    lists = W.windowing(np.arange(length), win, hop)
    assert mat.shape == (len(lists), win)
    for row, lst in zip(mat, lists):
        np.testing.assert_array_equal(row, lst)


def test_stitch_equals_counter_average():
    rng = np.random.default_rng(0)
    length, win, hop, ncls = 750, 300, 200, 7
    mat = W.window_index_matrix(length, win, hop)
    outs = rng.normal(size=(mat.shape[0], win, ncls)).astype(np.float32)

    # oracle: scatter-add then divide by visit counts (trainer.py:870-890)
    final = np.zeros((length, ncls), dtype=np.float32)
    counts = np.zeros((length,), dtype=np.float32)
    for w_out, w_idx in zip(outs, mat):
        final[w_idx] += w_out
        counts[w_idx] += 1.0
    final /= counts[:, None]

    got = W.stitch_windows_np(outs, mat, length)
    np.testing.assert_allclose(got, final, rtol=1e-5, atol=1e-5)
    # windows: [0,300), [200,500), [300,600)... -> overlap counts match the
    # reference Counter, so every frame was visited at least once
    assert (counts >= 1).all()


def test_windowing_fuzz_matches_reference():
    """Randomized (length, window, hop) sweep incl. the degenerate
    corners the parametrized cases skip: hop > window (gap windows),
    hop == window, length < window, window == 1."""
    rng = np.random.default_rng(1234)
    for _ in range(300):
        length = int(rng.integers(1, 900))
        win = int(rng.integers(1, 400))
        hop = int(rng.integers(1, 400))
        x = np.arange(length)
        got = W.windowing(x, win, hop)
        want = ref_windowing(x, win, hop)
        assert len(got) == len(want), (length, win, hop)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w, err_msg=str((length, win, hop)))
        if length >= win:
            mat = W.window_index_matrix(length, win, hop)
            assert mat.shape == (len(want), win), (length, win, hop)
            for row, lst in zip(mat, want):
                np.testing.assert_array_equal(row, lst)


def test_stitch_zero_coverage_frames_stay_zero():
    """hop > window leaves inter-window gaps; the reference Counter
    division only divides visited indices (trainer.py:870-890), so
    uncovered frames must come out 0, not NaN."""
    length, win, hop, ncls = 20, 4, 6, 3
    mat = W.window_index_matrix(length, win, hop)
    outs = np.ones((mat.shape[0], win, ncls), np.float32)
    got = W.stitch_windows_np(outs, mat, length)
    covered = np.zeros(length, bool)
    covered[mat.reshape(-1)] = True
    assert (~covered).any()  # the config really has gaps
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got[~covered], 0.0)
    np.testing.assert_array_equal(got[covered], 1.0)


def test_pad_short_window_indices():
    idx = W.pad_short_window_indices(4, 7)
    np.testing.assert_array_equal(idx, [0, 1, 2, 3, 3, 3, 3])


def test_eval_loader_batches_grouping(tmp_path):
    """batches() groups same-bucket videos and isolates windowed ones."""
    import os
    from fvt_tpu.data.dataset import ExampleBuilder
    from fvt_tpu.data.loader import EvalLoader
    from fvt_tpu import constants

    rng = np.random.default_rng(0)
    work = []
    for i, length in enumerate([30, 35, 40, 80, 85, 200]):
        tdir = str(tmp_path / f't{i}')
        os.makedirs(tdir)
        np.save(tdir + '/vggish.npy',
                rng.normal(size=(length, 128)).astype(np.float32))
        np.save(tdir + '/EXPR_continuous_label.npy',
                np.zeros((length,), np.int64))
        work.append([tdir, f't{i}', length, np.arange(length)])

    builder = ExampleBuilder(['vggish', constants.EXPR], window_length=20)
    loader = EvalLoader(work, builder, bucket_quantum=50)

    got = list(loader.batches(batch_videos=4, windowed_threshold=100))
    by_bucket = {}
    for batch, trials, lens, bucket in got:
        assert batch['vggish'].shape[0] == len(trials)
        assert batch['vggish'].shape[1] == bucket
        by_bucket.setdefault(bucket, []).extend(trials)
    # 30/35/40 -> bucket 50 grouped; 80/85 -> bucket 100 grouped;
    # 200 exceeds the windowed threshold -> singleton
    assert sorted(by_bucket[50]) == ['t0', 't1', 't2']
    assert sorted(by_bucket[100]) == ['t3', 't4']
    assert by_bucket[200] == ['t5']
    singleton = [g for g in got if g[1] == ['t5']]
    assert len(singleton) == 1


def test_windowing_matches_reference_functions_directly():
    """Golden parity against the reference's own windowing implementations
    (dataset-level strict-> and trainer-level >=)."""
    from conftest import add_reference_to_path
    add_reference_to_path()
    from base.dataset import GenericDataArranger
    from trainer import Trainer as RefTrainer

    for length in [1, 5, 299, 300, 301, 499, 500, 777, 1234]:
        x = np.arange(length)
        ref_ds = GenericDataArranger.windowing(x, 300, 200)
        got = W.windowing(x, 300, 200)
        assert len(got) == len(ref_ds)
        for g, r in zip(got, ref_ds):
            np.testing.assert_array_equal(g, r)

        if length >= 300:  # trainer variant only used for long videos
            ref_tr = RefTrainer.windowing(x, 300, 200)
            mat = W.window_index_matrix(length, 300, 200)
            assert mat.shape[0] == len(ref_tr)
            for row, r in zip(mat, ref_tr):
                np.testing.assert_array_equal(row, r)


def test_ladder_len_bounds_and_shape_count():
    """Upload-ladder contract: result >= true_len, quantum-aligned,
    pad waste < quantum below 4x window (the linear region), and the
    total number of distinct shapes for lengths up to 100x window stays
    small (bounded compile count)."""
    win, quantum = 300, 100
    shapes = set()
    for true_len in range(win + 1, 100 * win, 7):
        v = W.ladder_len(true_len, win)
        assert v >= true_len
        assert v % quantum == 0
        if true_len <= 4 * win:
            assert v - true_len < quantum, (true_len, v)
        shapes.add(v)
    assert len(shapes) < 25, sorted(shapes)
    # monotone in true_len
    ls = [W.ladder_len(t, win) for t in range(win + 1, 10 * win, 13)]
    assert all(a <= b for a, b in zip(ls, ls[1:]))
