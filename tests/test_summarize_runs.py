"""Cross-run aggregator (tools/summarize_runs.py).

Builds fake completed/unfinished run dirs with compute_perf-shaped
test-*-perf.pkl artifacts and checks discovery gating (passed.txt,
parseit.py:311-315 semantics), master-metric selection semantics
(build_trackers: MELD -> video W-F1 per aggregation, C-EXPR-DB ->
frame W-F1 per ignore-class), CV mean/std grouping, and the CLI.
"""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import yaml

from fvt_tpu import constants

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
import summarize_runs as sr  # noqa: E402


def _perf(frame_wf1, video_wf1=None, ignore_classes=(None,)):
    """Minimal compute_perf-shaped dict with distinct scalars."""
    out = {}
    for k, ign in enumerate(ignore_classes):
        atom = lambda v: {'master': v, 'per_cl': np.array([v])}  # noqa
        base = frame_wf1 + 0.001 * k
        perf = {
            constants.W_F1: {
                constants.FRAME_LEVEL: atom(base),
                constants.VIDEO_LEVEL: {
                    vp: atom((video_wf1 if video_wf1 is not None
                              else base + 0.01) + 0.002 * j)
                    for j, vp in enumerate(constants.VIDEO_PREDS)},
            },
            constants.MACRO_F1: {
                constants.FRAME_LEVEL: atom(base - 0.1),
                constants.VIDEO_LEVEL: {
                    vp: atom(base - 0.11) for vp in constants.VIDEO_PREDS},
            },
            constants.CL_ACC: {
                constants.FRAME_LEVEL: atom(base + 0.1),
                constants.VIDEO_LEVEL: {
                    vp: atom(base + 0.11) for vp in constants.VIDEO_PREDS},
            },
            constants.CFUSE_MARIX: {
                constants.FRAME_LEVEL: atom(np.eye(2)),
                constants.VIDEO_LEVEL: {
                    vp: atom(np.eye(2)) for vp in constants.VIDEO_PREDS},
            },
        }
        out[ign] = perf
    return out


def _make_run(root, name, ds, fold, items, passed=True, model='LFAN',
              modality='vggish+bert+EXPR_continuous_label'):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, 'config.yml'), 'w') as f:
        yaml.dump({'dataset_name': ds, 'model_name': model,
                   'modality': modality, 'fold_to_run': fold,
                   'seed': 0}, f)
    for item, perf in items.items():
        with open(os.path.join(
                d, f'{constants.TESTSET}-{item}-perf.pkl'), 'wb') as f:
            pickle.dump(perf, f)
    if passed:
        with open(os.path.join(d, 'passed.txt'), 'w') as f:
            f.write('finished.')
    return d


def test_discovery_gates_on_passed_txt(tmp_path):
    root = str(tmp_path)
    _make_run(root, 'a', constants.MELD, 0,
              {constants.FRM_VOTE: _perf(0.5)})
    _make_run(root, 'b', constants.MELD, 0,
              {constants.FRM_VOTE: _perf(0.6)}, passed=False)
    runs, skipped = sr.discover_runs([root])
    assert [os.path.basename(r) for r in runs] == ['a']
    assert [os.path.basename(s) for s in skipped] == ['b']
    runs, skipped = sr.discover_runs([root], include_unfinished=True)
    assert len(runs) == 2 and not skipped


def test_best_models_config_copies_not_runs(tmp_path):
    root = str(tmp_path)
    d = _make_run(root, 'a', constants.MELD, 0,
                  {constants.FRM_VOTE: _perf(0.5)})
    # best-models/<item>/config.yml copies must not be discovered
    sub = os.path.join(d, 'best-models', constants.FRM_VOTE)
    os.makedirs(sub)
    with open(os.path.join(sub, 'config.yml'), 'w') as f:
        yaml.dump({'dataset_name': constants.MELD}, f)
    runs, _ = sr.discover_runs([root])
    assert runs == [d]


def test_master_semantics_meld_vs_cexpr(tmp_path):
    root = str(tmp_path)
    _make_run(root, 'meld', constants.MELD, 0,
              {constants.FRM_AVG_PROBS: _perf(0.4, video_wf1=0.7)})
    _make_run(root, 'cexpr', constants.C_EXPR_DB, 0,
              {'None': _perf(0.55, ignore_classes=(None, 7)),
               '7': _perf(0.55, ignore_classes=(None, 7))},
              model='CAN')
    out = sr.summarize([root])
    by = {(r['dataset_name'], r['item']): r for r in out['runs']}
    # MELD master = video W-F1 under the item's aggregation rule
    meld = by[(constants.MELD, constants.FRM_AVG_PROBS)]
    assert meld['master'] == meld['video_W_F1_avg_probs']
    j = constants.VIDEO_PREDS.index(constants.FRM_AVG_PROBS)
    assert abs(meld['master'] - (0.7 + 0.002 * j)) < 1e-9
    # C-EXPR-DB master = frame W-F1 in the item's ignore-class slice
    assert abs(by[(constants.C_EXPR_DB, 'None')]['master'] - 0.55) < 1e-9
    assert abs(by[(constants.C_EXPR_DB, '7')]['master'] - 0.551) < 1e-9


def test_cv_grouping_mean_std(tmp_path):
    root = str(tmp_path)
    for fold, wf1 in enumerate([0.5, 0.6, 0.7]):
        _make_run(root, f'fold{fold}', constants.C_EXPR_DB, fold,
                  {'None': _perf(wf1)})
    out = sr.summarize([root])
    assert len(out['groups']) == 1
    g = out['groups'][0]
    assert g['n_runs'] == 3 and g['folds'] == [0, 1, 2]
    np.testing.assert_allclose(g['master_mean'], 0.6)
    np.testing.assert_allclose(g['master_std'], np.std([0.5, 0.6, 0.7]))
    text = sr.render(out)
    assert 'mean +/- std' in text and 'fold2' in text


def test_missing_perf_nodes_render_as_dash(tmp_path):
    """A foreign/partial perf pkl (missing video level) yields None
    scalars; render() must print '-' instead of crashing on
    float('-') in the float-dtype column (advisor r4)."""
    root = str(tmp_path)
    perf = _perf(0.5)
    # strip the video level entirely -> extract_row returns None there
    for ign in perf:
        for metric in list(perf[ign]):
            perf[ign][metric].pop(constants.VIDEO_LEVEL, None)
    _make_run(root, 'partial', constants.C_EXPR_DB, 0, {'None': perf})
    out = sr.summarize([root])
    row = out['runs'][0]
    assert row['video_W_F1_vote'] is None
    assert row['master'] == row['frame_W_F1'] is not None
    text = sr.render(out)  # must not raise
    assert ' - ' in text   # the None cells render as '-'


def test_mixed_none_and_int_folds_group(tmp_path):
    """A group mixing fold=None (config without fold_to_run) and int
    folds must not TypeError in sorted() (advisor r4)."""
    root = str(tmp_path)
    _make_run(root, 'a', constants.C_EXPR_DB, 0, {'None': _perf(0.5)})
    _make_run(root, 'b', constants.C_EXPR_DB, None, {'None': _perf(0.7)})
    out = sr.summarize([root])
    g = out['groups'][0]
    assert g['n_runs'] == 2 and set(g['folds']) == {0, None}
    np.testing.assert_allclose(g['master_mean'], 0.6)
    sr.render(out)  # must not raise


def test_cli_json_roundtrip(tmp_path):
    root = str(tmp_path / 'exps')
    _make_run(root, 'a', constants.MELD, 0,
              {constants.FRM_VOTE: _perf(0.5)})
    _make_run(root, 'b', constants.MELD, 1,
              {constants.FRM_VOTE: _perf(0.9)})
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jpath = str(tmp_path / 'summary.json')
    r = subprocess.run(
        [sys.executable, os.path.join(repo, 'tools', 'summarize_runs.py'),
         '--roots', root, '--json', jpath],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stdout + r.stderr
    data = json.loads(open(jpath).read())
    assert len(data['runs']) == 2 and len(data['groups']) == 1
    j = constants.VIDEO_PREDS.index(constants.FRM_VOTE)
    expect = np.mean([0.51 + 0.002 * j, 0.91 + 0.002 * j])
    np.testing.assert_allclose(data['groups'][0]['master_mean'], expect)

    # empty root -> exit 1, no crash
    empty = str(tmp_path / 'empty')
    os.makedirs(empty)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, 'tools', 'summarize_runs.py'),
         '--roots', empty], capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS='cpu'))
    assert r.returncode == 1
    assert 'No completed runs' in r.stdout
