"""Metric-engine parity: vs sklearn and vs the reference implementation."""
import os

import numpy as np
import pytest

from fvt_tpu import constants
from fvt_tpu.train import metrics as M

from conftest import add_reference_to_path


def make_data(seed=0, n_videos=40, ncls=8, n=57):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n_videos):
        data[f"v{i}"] = {
            'labels': np.full((n,), rng.integers(0, ncls), dtype=np.int64),
            'logits': rng.normal(size=(n, ncls)).astype(np.float32),
        }
    return data


@pytest.mark.parametrize('ignore_class', [None, 7])
def test_f1_acc_confusion_vs_sklearn(ignore_class):
    from sklearn.metrics import f1_score, confusion_matrix
    data = make_data(3)
    preds, trgs = M.format_trg_pred_frames(data, ignore_class=ignore_class)

    f1_per, macro = M.compute_f1_score(trgs, preds, constants.MACRO_F1)
    np.testing.assert_allclose(f1_per, f1_score(trgs, preds, average=None),
                               atol=1e-12)
    assert abs(macro - np.mean(f1_score(trgs, preds, average=None))) < 1e-12

    _, wf1 = M.compute_f1_score(trgs, preds, constants.W_F1)
    assert abs(wf1 - f1_score(trgs, preds, average='weighted')) < 1e-12

    acc = M.compute_class_acc(trgs, preds)
    assert abs(acc - 100.0 * np.mean(np.array(trgs) == np.array(preds))) \
        < 1e-4

    cm = M.compute_confusion_matrix(trgs, preds)
    np.testing.assert_allclose(
        cm, confusion_matrix(trgs, preds, normalize='true'), atol=1e-12)


@pytest.mark.parametrize('ignore_class', [None, 7])
def test_formatting_vs_reference(ignore_class):
    add_reference_to_path()
    import metrics as ref_metrics  # /root/reference/metrics.py

    data = make_data(11)
    got_p, got_t = M.format_trg_pred_frames(data, ignore_class=ignore_class)
    ref_p, ref_t = ref_metrics.format_trg_pred_frames(
        data, ignore_class=ignore_class)
    assert got_p == ref_p and got_t == ref_t

    got_p, got_t = M.format_trg_pred_video(data, ignore_class=ignore_class)
    ref_p, ref_t = ref_metrics.format_trg_pred_video(
        data, ignore_class=ignore_class)
    assert got_t == ref_t
    assert got_p == ref_p  # includes the Counter tie-break rule


def test_compute_perf_structure_and_tracker():
    data = make_data(5, n_videos=20)
    perf = M.compute_perf(data, constants.C_EXPR_DB, use_other_class=True)
    assert set(perf.keys()) == {None, 7}
    node = perf[None][constants.W_F1][constants.FRAME_LEVEL]
    assert 0.0 <= node['master'] <= 1.0
    vnode = perf[7][constants.MACRO_F1][constants.VIDEO_LEVEL]
    assert set(vnode.keys()) == set(constants.VIDEO_PREDS)

    trackers = M.build_trackers(constants.C_EXPR_DB, use_other_class=True)
    assert set(trackers.keys()) == {None, 7}
    t = trackers[None]
    t.append(perf)
    assert t.is_last_best and t.best_value_idx == 0
    # strictly worse second epoch
    perf2 = {ic: perf[ic] for ic in perf}
    import copy
    perf2 = copy.deepcopy(perf)
    perf2[None][constants.W_F1][constants.FRAME_LEVEL]['master'] -= 1.0
    t.append(perf2)
    assert not t.is_last_best
    # ties count as new best (reference uses >=, metrics.py:410)
    perf3 = copy.deepcopy(perf)
    t.append(perf3)
    assert t.is_last_best and t.best_value_idx == 2

    report = t.report(perf, {i: f"c{i}" for i in range(8)})
    assert 'Master:' in report


def test_meld_trackers():
    trackers = M.build_trackers(constants.MELD, use_other_class=False)
    assert set(trackers.keys()) == set(constants.VIDEO_PREDS)
    data = make_data(7, n_videos=15, ncls=7)
    perf = M.compute_perf(data, constants.MELD, use_other_class=False)
    for t in trackers.values():
        t.append(perf)
        assert t.best_value is not None


def test_texttable_style_tables():
    """Report tables carry texttable's default decoration: bordered
    cells, '=' rule under a centered header, precision-6 floats."""
    import numpy as np
    from fvt_tpu.utils.tables import (draw_table, print_confusion_mtx,
                                      print_vector)

    t = draw_table(['*', 'joy'], [['joy', 0.5]], ['t', 'f'])
    lines = t.split('\n')
    assert lines[0].startswith('+-') and lines[0].endswith('-+')
    assert lines[2].startswith('+=') and '=' in lines[2]
    assert '| 0.500000' in t
    # header centered, all rules equal width
    assert len(set(len(l) for l in lines)) == 1

    int_to_cl = {0: 'neutral', 1: 'joy'}
    m = print_confusion_mtx(np.asarray([[0.75, 0.25], [0.1, 0.9]]),
                            int_to_cl)
    assert 'neutral' in m and '0.750000' in m and m.count('+') >= 12

    v = print_vector(np.asarray([0.1, 0.9]), int_to_cl)
    assert 'joy' in v and '0.900000' in v


def test_perf_report_contains_tables():
    """PerfTracker.report renders the confusion matrix and per-class F1
    as tables (the reference's artifact look, tools.py:18-70)."""
    import numpy as np
    from fvt_tpu import constants
    from fvt_tpu.train import metrics as M

    rng = np.random.default_rng(0)
    data = {f'v{i}': {'labels': np.full(20, i % 7),
                      'logits': rng.normal(size=(20, 7)).astype(np.float32)}
            for i in range(6)}
    perf = M.compute_perf(data, constants.MELD, use_other_class=False)
    tr = M.build_trackers(constants.MELD, use_other_class=False)
    item = next(iter(tr))
    int_to_cl = {i: f'cl{i}' for i in range(7)}
    rep = tr[item].report(perf, int_to_cl)
    assert '+=' in rep          # header rule
    assert rep.count('|') > 20  # bordered cells
    assert 'Master:' in rep


def test_tracker_plot_writes_png(tmp_path):
    """save_plot surface: master curve + best marker + loss twin axis."""
    pytest.importorskip('matplotlib')
    from fvt_tpu.train.metrics import PerfTracker
    from fvt_tpu import constants as C

    tr = PerfTracker(master_metric=C.W_F1, master_level=C.FRAME_LEVEL)
    rng = np.random.default_rng(0)
    for v in (0.2, 0.5, 0.4, 0.7):
        tr.append({None: {C.W_F1: {C.FRAME_LEVEL: {
            'master': v, 'per_cl': rng.random(7)}}}})
    assert tr.master_series() == [0.2, 0.5, 0.4, 0.7]
    wfp = str(tmp_path / 'tracker.png')
    assert tr.plot(wfp, loss_tracker=[2.0, 1.5, 1.2])
    assert os.path.getsize(wfp) > 1000


def test_compute_perf_all_ignored_raises_with_message():
    """An eval set where every video carries the ignored class must fail
    with a diagnosable ValueError, not the reference's bare IndexError
    (/root/reference/metrics.py:89-145 -> preds[0])."""
    rng = np.random.default_rng(0)
    data = {
        f"v{i}": {
            'labels': np.full((13,), 7, dtype=np.int64),  # all 'Other'
            'logits': rng.normal(size=(13, 8)).astype(np.float32),
        } for i in range(4)
    }
    with pytest.raises(ValueError, match='ignored class'):
        M.compute_perf(data, constants.C_EXPR_DB, use_other_class=True)


def test_softmax_overflow_guard_and_bit_parity():
    """Rows whose logits would overflow np.exp (float32 > ~88.7) are
    max-shifted instead of going NaN; for sane rows the output is
    BIT-identical to the reference's unshifted formula."""
    from fvt_tpu.train.metrics import softmax

    sane = np.array([[1.0, 2.0, 3.0], [-5.0, 0.0, 79.9]], np.float32)
    ref = np.exp(sane) / np.exp(sane).sum(1, keepdims=True)
    np.testing.assert_array_equal(softmax(sane), ref)

    hot = np.array([[200.0, 0.0, 0.0], [90.0, 89.0, -10.0]], np.float32)
    out = softmax(hot)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out.sum(1), 1.0, rtol=1e-6)
    assert out[0].argmax() == 0 and out[1].argmax() == 0
