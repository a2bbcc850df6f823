"""Store integrity checker (tools/validate_store.py).

A clean synthetic store validates with zero errors; each injected defect
class (truncated npy, frame-count drift, missing trial dir, stale
video_48, out-of-range label, mixed extractor generations, fold trial
missing from the store, duplicate trial) is detected as the right issue
kind at the right severity.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from fvt_tpu import constants
from fvt_tpu.utils.io import load_pickle, save_pickle
from synth_store import make_cexpr_store, make_meld_store

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
import validate_store as vs  # noqa: E402


@pytest.fixture()
def meld_store(tmp_path):
    make_meld_store(str(tmp_path), n_train=4, n_val=2, n_test=2,
                    min_len=6, max_len=12, with_video=True)
    return str(tmp_path)


def _validate(root, ds=constants.MELD, **kw):
    kw.setdefault('folds_dir', os.path.join(root, 'folds', ds))
    return vs.validate(root, ds, **kw).as_dict()


def test_clean_store_validates(meld_store):
    out = _validate(meld_store, deep=True)
    assert out['ok'], out
    assert out['counts']['trials_checked'] == 8
    assert not out['errors']
    # synth stores are stamped with the current generation -> no warnings
    assert 'extractor_stamp_missing' not in out['warnings']


def test_clean_challenge_store_validates(tmp_path):
    make_cexpr_store(str(tmp_path), ds=constants.C_EXPR_DB_CHALLENGE,
                     n_train=3, min_len=6, max_len=10, video_hw=64)
    out = vs.validate(str(tmp_path), constants.C_EXPR_DB_CHALLENGE,
                      folds_dir=str(tmp_path / 'folds' /
                                    constants.C_EXPR_DB_CHALLENGE))
    assert out.as_dict()['ok'], out.as_dict()


def _trial_dir(root, trial):
    return os.path.join(root, 'features', 'compacted_48', trial)


def _first_trial(root, split='train'):
    info = load_pickle(os.path.join(
        root, 'features', f'dataset_info_{constants.MELD}_{split}.pkl'))
    return info['trial'][0]


def test_truncated_npy_detected(meld_store):
    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t), 'vggish.npy')
    with open(path, 'r+b') as f:
        f.truncate(os.path.getsize(path) - 100)
    out = _validate(meld_store)
    assert not out['ok']
    assert out['counts']['npy_truncated'] == 1
    assert any(t in e for e in out['errors']['npy_truncated'])


def test_frame_count_mismatch_detected(meld_store):
    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t), 'bert.npy')
    arr = np.load(path)
    np.save(path, arr[:-2])
    out = _validate(meld_store)
    assert not out['ok']
    assert out['counts']['frame_count_mismatch'] == 1


def test_video_length_drift_is_warning_for_challenge(tmp_path):
    """C-EXPR-DB*: the arranger re-reads video.npy (arranger.py:55-60),
    so a video-vs-recorded-length drift is survivable -> warning; the
    other modalities still error."""
    make_cexpr_store(str(tmp_path), ds=constants.C_EXPR_DB_CHALLENGE,
                     n_train=2, min_len=8, max_len=10, video_hw=32)
    root = str(tmp_path)
    info = load_pickle(os.path.join(
        root, 'features',
        f'dataset_info_{constants.C_EXPR_DB_CHALLENGE}_train.pkl'))
    t = info['trial'][0]
    path = os.path.join(_trial_dir(root, t), 'video.npy')
    arr = np.load(path)
    np.save(path, arr[:-1])
    out = vs.validate(root, constants.C_EXPR_DB_CHALLENGE)
    d = out.as_dict()
    assert d['ok'], d  # warning only
    assert 'frame_count_mismatch' in d['warnings']


def test_mixed_sink_kind_counts_split_correctly(tmp_path):
    """frame_count_mismatch can be a warning (challenge video drift) AND
    an error (other modality drift) in the same report; n_errors /
    n_warnings must tally per sink, not per kind."""
    make_cexpr_store(str(tmp_path), ds=constants.C_EXPR_DB_CHALLENGE,
                     n_train=2, min_len=8, max_len=10, video_hw=32)
    root = str(tmp_path)
    info = load_pickle(os.path.join(
        root, 'features',
        f'dataset_info_{constants.C_EXPR_DB_CHALLENGE}_train.pkl'))
    t0, t1 = info['trial'][0], info['trial'][1]
    for t, name in ((t0, 'video'), (t1, 'bert')):
        path = os.path.join(_trial_dir(root, t), f'{name}.npy')
        arr = np.load(path)
        np.save(path, arr[:-1])
    d = vs.validate(root, constants.C_EXPR_DB_CHALLENGE).as_dict()
    assert not d['ok']
    # t1/bert shorter than the runtime (video) length -> 1 error;
    # t0's video-vs-recorded drift + its now-longer-than-video feature
    # streams -> survivable warnings only
    assert 'frame_count_mismatch' in d['errors']
    assert 'frame_count_mismatch' in d['warnings']
    assert d['n_errors'] == 1, d
    assert d['n_warnings'] == d['counts']['frame_count_mismatch'] - 1, d


def test_video_longer_than_features_is_error_for_challenge(tmp_path):
    """The arranger trusts video.npy rows (arranger.py:55-61): features
    shorter than video crash the runtime window gather -> fsck error."""
    make_cexpr_store(str(tmp_path), ds=constants.C_EXPR_DB_CHALLENGE,
                     n_train=2, min_len=8, max_len=10, video_hw=32)
    root = str(tmp_path)
    info = load_pickle(os.path.join(
        root, 'features',
        f'dataset_info_{constants.C_EXPR_DB_CHALLENGE}_train.pkl'))
    t = info['trial'][0]
    path = os.path.join(_trial_dir(root, t), 'video.npy')
    vid = np.load(path)
    np.save(path, np.concatenate([vid, vid[:2]]))  # video grows 2 rows
    d = vs.validate(root, constants.C_EXPR_DB_CHALLENGE).as_dict()
    assert not d['ok'], d
    assert any('index out of range' in e
               for e in d['errors']['frame_count_mismatch']), d


def test_missing_video_is_error_for_challenge(tmp_path):
    make_cexpr_store(str(tmp_path), ds=constants.C_EXPR_DB_CHALLENGE,
                     n_train=2, min_len=8, max_len=10, video_hw=32)
    root = str(tmp_path)
    info = load_pickle(os.path.join(
        root, 'features',
        f'dataset_info_{constants.C_EXPR_DB_CHALLENGE}_train.pkl'))
    os.remove(os.path.join(_trial_dir(root, info['trial'][0]),
                           'video.npy'))
    d = vs.validate(root, constants.C_EXPR_DB_CHALLENGE).as_dict()
    assert not d['ok']
    assert 'video_missing' in d['errors']


def test_missing_or_empty_fold_txt_is_error(meld_store):
    split_dir = os.path.join(meld_store, 'folds', constants.MELD,
                             'split-0')
    os.remove(os.path.join(split_dir, 'test.txt'))
    out = _validate(meld_store)
    assert not out['ok']
    assert 'fold_txt_missing' in out['errors']

    with open(os.path.join(split_dir, 'test.txt'), 'w'):
        pass  # exists but empty -> init_loaders would raise
    out = _validate(meld_store)
    assert not out['ok']
    assert 'fold_txt_empty' in out['errors']


def test_missing_info_split_is_error(meld_store):
    os.remove(os.path.join(meld_store, 'features',
                           f'dataset_info_{constants.MELD}_test.pkl'))
    out = vs.validate(meld_store, constants.MELD).as_dict()  # no folds
    assert not out['ok']
    assert 'dataset_info_split_missing' in out['errors']


def test_empty_label_file_reports_not_crashes(meld_store):
    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t),
                        'EXPR_continuous_label.npy')
    lab = np.load(path)
    np.save(path, lab[:0])
    out = _validate(meld_store)  # must not raise on .min() of empty
    assert not out['ok']
    assert 'frame_count_mismatch' in out['errors']


def test_missing_trial_dir_detected(meld_store):
    t = _first_trial(meld_store)
    import shutil
    shutil.rmtree(_trial_dir(meld_store, t))
    out = _validate(meld_store)
    assert not out['ok']
    assert out['counts']['trial_dir_missing'] == 1


def test_stale_recompacted_flagged(meld_store):
    from fvt_tpu.preprocess.recompact import recompact_trial
    t = _first_trial(meld_store)
    d = _trial_dir(meld_store, t)
    assert recompact_trial(d, size=48)
    out = _validate(meld_store)
    assert out['ok'] and 'recompacted_stale' not in out['warnings']
    # rewrite the source AFTER recompaction (forced newer mtime)
    vid = np.load(os.path.join(d, 'video.npy'))
    np.save(os.path.join(d, 'video.npy'), vid)
    future = time.time() + 5
    os.utime(os.path.join(d, 'video.npy'), (future, future))
    out = _validate(meld_store)
    assert out['ok']  # stale recompact is a warning, not an error
    assert 'recompacted_stale' in out['warnings']


def test_label_out_of_range_detected(meld_store):
    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t),
                        'EXPR_continuous_label.npy')
    lab = np.load(path)
    lab[0] = 99
    np.save(path, lab)
    out = _validate(meld_store)
    assert not out['ok']
    assert out['counts']['label_out_of_range'] == 1


def test_mixed_generations_detected(meld_store):
    path = os.path.join(meld_store, 'features',
                        f'dataset_info_{constants.MELD}_val.pkl')
    info = load_pickle(path)
    info['extractor_version'] = 1
    save_pickle(info, path)
    out = _validate(meld_store)
    assert not out['ok']
    assert 'extractor_generation_mixed' in out['errors']
    assert 'extractor_generation_old' in out['warnings']


def test_fold_trial_missing_is_warning_fully_missing_is_error(meld_store):
    fold_txt = os.path.join(meld_store, 'folds', constants.MELD,
                            'split-0', 'val.txt')
    with open(fold_txt, 'a') as f:
        f.write('val/ghost,0,missing transcript\n')
    out = _validate(meld_store)
    assert out['ok']  # one missing trial mirrors the reference's
    assert 'fold_trial_not_in_store' in out['warnings']

    with open(fold_txt, 'w') as f:
        f.write('val/ghost,0,missing transcript\n')
    out = _validate(meld_store)
    assert not out['ok']
    assert 'fold_split_fully_missing' in out['errors']


def test_duplicate_trial_detected(meld_store):
    path = os.path.join(meld_store, 'features',
                        f'dataset_info_{constants.MELD}_train.pkl')
    info = load_pickle(path)
    info['trial'].append(info['trial'][0])
    info['length'].append(info['length'][0])
    save_pickle(info, path)
    out = _validate(meld_store)
    assert not out['ok']
    assert out['counts']['duplicate_trial'] == 1


def test_nonfinite_feature_needs_deep(meld_store):
    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t), 'vggish.npy')
    arr = np.load(path)
    arr[0, 0] = np.nan
    np.save(path, arr)
    assert _validate(meld_store)['ok']          # shallow pass misses it
    out = _validate(meld_store, deep=True)
    assert not out['ok']
    assert 'nonfinite_feature' in out['errors']


# ---------------------------------------------------------------------------
# --repair: the reference's hard-coded challenge fixups
# (compact_face_images.py:245-276) as a general, safe operation
# ---------------------------------------------------------------------------

def test_repair_truncates_overlong_stream(meld_store):
    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t), 'vggish.npy')
    arr = np.load(path)
    np.save(path, np.concatenate([arr, arr[:3]]))
    assert not _validate(meld_store)['ok']
    actions = vs.repair(meld_store, constants.MELD)
    assert any(a['action'] == 'truncated_stream' and 'vggish' in a['file']
               for a in actions), actions
    post = _validate(meld_store, deep=True)
    assert post['ok'], post
    np.testing.assert_array_equal(np.load(path), arr)  # kept rows intact


def test_repair_salvages_truncated_payload(meld_store):
    """A mid-row write truncation is salvaged to the complete leading
    rows; when those still cover the recorded length the store is fully
    healed."""
    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t), 'vggish.npy')
    arr = np.load(path)
    n = arr.shape[0]
    np.save(path, np.concatenate([arr, arr[:2]]))  # n+2 rows on disk
    offset, shape, dtype, _f = vs.npy_header(path)
    row_bytes = int(np.prod(shape[1:])) * dtype.itemsize
    with open(path, 'r+b') as f:
        f.truncate(offset + n * row_bytes + 7)  # mid-row tail
    pre = _validate(meld_store)
    assert 'npy_truncated' in pre['errors']
    actions = vs.repair(meld_store, constants.MELD)
    kinds = {a['action'] for a in actions}
    assert 'salvaged_truncated' in kinds, actions
    post = _validate(meld_store, deep=True)
    assert post['ok'], post
    np.testing.assert_array_equal(np.load(path), arr)


def test_repair_sweeps_orphan_fsck_tmp(meld_store):
    """A repair that crashed between np.save(tmp) and os.replace leaves
    <name>.fsck_tmp.npy behind; the next repair pass must delete it
    instead of treating it as an unknown stream forever (advisor r4)."""
    t = _first_trial(meld_store)
    tdir = _trial_dir(meld_store, t)
    orphan = os.path.join(tdir, 'vggish.npy.fsck_tmp.npy')
    np.save(orphan, np.zeros((2, 3), dtype=np.float32))
    actions = vs.repair(meld_store, constants.MELD)
    assert any(a['action'] == 'removed_orphan_tmp'
               and a['file'].endswith('.fsck_tmp.npy')
               for a in actions), actions
    assert not os.path.exists(orphan)
    assert _validate(meld_store, deep=True)['ok']


def test_repair_cannot_fabricate_missing_rows(meld_store):
    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t), 'bert.npy')
    arr = np.load(path)
    np.save(path, arr[:-2])  # SHORTER than the recorded length
    actions = vs.repair(meld_store, constants.MELD)
    assert not any('bert' in a.get('file', '') for a in actions), actions
    post = _validate(meld_store)
    assert not post['ok']  # honestly still broken
    assert 'frame_count_mismatch' in post['errors']


def test_repair_removes_stale_recompact(meld_store):
    from fvt_tpu.preprocess.recompact import recompact_trial
    t = _first_trial(meld_store)
    d = _trial_dir(meld_store, t)
    assert recompact_trial(d, size=48)
    future = time.time() + 5
    os.utime(os.path.join(d, 'video.npy'), (future, future))
    assert 'recompacted_stale' in _validate(meld_store)['warnings']
    actions = vs.repair(meld_store, constants.MELD)
    assert any(a['action'] == 'removed_stale_recompact' for a in actions)
    assert not os.path.isfile(os.path.join(d, 'video_48.npy'))
    post = _validate(meld_store)
    assert post['ok'] and 'recompacted_stale' not in post['warnings']


def test_repair_realigns_challenge_recorded_length(tmp_path):
    """C-EXPR-DB*: video.npy is the authority — repair truncates the
    other streams to its rows AND rewrites the recorded dataset_info
    length (the generalized reference fixup)."""
    make_cexpr_store(str(tmp_path), ds=constants.C_EXPR_DB_CHALLENGE,
                     n_train=2, min_len=8, max_len=10, video_hw=32)
    root = str(tmp_path)
    info_path = os.path.join(
        root, 'features',
        f'dataset_info_{constants.C_EXPR_DB_CHALLENGE}_train.pkl')
    info = load_pickle(info_path)
    t = info['trial'][0]
    vpath = os.path.join(_trial_dir(root, t), 'video.npy')
    vid = np.load(vpath)
    np.save(vpath, vid[:-2])  # video shrinks; features/record now long
    pre = vs.validate(root, constants.C_EXPR_DB_CHALLENGE).as_dict()
    assert 'frame_count_mismatch' in pre['warnings']
    actions = vs.repair(root, constants.C_EXPR_DB_CHALLENGE)
    kinds = {a['action'] for a in actions}
    assert {'truncated_stream', 'realigned_recorded_length',
            'rewrote_dataset_info'} <= kinds, actions
    post = vs.validate(root, constants.C_EXPR_DB_CHALLENGE).as_dict()
    assert post['ok'], post
    assert 'frame_count_mismatch' not in post['warnings'], post
    new_info = load_pickle(info_path)
    i = new_info['trial'].index(t)
    assert int(new_info['length'][i]) == vid.shape[0] - 2


def test_repair_cli_roundtrip(meld_store, tmp_path):
    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t), 'vggish.npy')
    arr = np.load(path)
    np.save(path, np.concatenate([arr, arr[:1]]))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable,
           os.path.join(repo, 'tools', 'validate_store.py'),
           '--dataset_path', meld_store, '--dataset_name', constants.MELD,
           '--folds_dir', os.path.join(meld_store, 'folds', constants.MELD),
           '--repair', '--json', str(tmp_path / 'report.json')]
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads((tmp_path / 'report.json').read_text())
    assert not report['pre']['ok'] and report['post']['ok'] \
        and report['ok'], report
    assert any(a['action'] == 'truncated_stream'
               for a in report['repairs'])


def test_stale_mean_std_cache_warned_and_repaired(meld_store):
    """The runtime computes the mean/std cache once and never
    invalidates it (experiment.py:84-95); a store mutated after the
    cache was built silently trains with stale stats -> fsck warning,
    and --repair drops the cache so the next run recomputes."""
    cache = os.path.join(meld_store, 'mean_std_info_fold-0.pkl')
    save_pickle({'fake': 'stats'}, cache)
    past = time.time() - 3600
    os.utime(cache, (past, past))  # older than every feature npy
    out = _validate(meld_store)
    assert out['ok']  # warning, not error
    assert 'mean_std_cache_stale' in out['warnings']
    actions = vs.repair(meld_store, constants.MELD)
    assert any(a['action'] == 'removed_stale_mean_std_cache'
               for a in actions), actions
    assert not os.path.isfile(cache)
    post = _validate(meld_store)
    assert 'mean_std_cache_stale' not in post['warnings']

    # a FRESH cache (newer than every npy) is left alone
    save_pickle({'fake': 'stats'}, cache)
    future = time.time() + 60
    os.utime(cache, (future, future))
    assert 'mean_std_cache_stale' not in _validate(meld_store)['warnings']
    assert vs.repair(meld_store, constants.MELD) == []
    assert os.path.isfile(cache)


def test_repair_is_idempotent_fuzz(tmp_path):
    """Random repairable-defect soup: repair always heals the store,
    and a second repair pass is a no-op (idempotence)."""
    rng = np.random.RandomState(7)
    for it in range(3):
        root = str(tmp_path / f'it{it}')
        make_meld_store(root, n_train=3, n_val=1, n_test=1,
                        min_len=6, max_len=12, with_video=True)
        info = load_pickle(os.path.join(
            root, 'features', f'dataset_info_{constants.MELD}_train.pkl'))
        for t in info['trial']:
            d = os.path.join(root, 'features', 'compacted_48', t)
            for name in ('vggish', 'bert', 'video'):
                p = os.path.join(d, f'{name}.npy')
                roll = rng.randint(4)
                if roll == 0:       # over-long stream
                    a = np.load(p)
                    np.save(p, np.concatenate([a, a[:rng.randint(1, 4)]]))
                elif roll == 1:     # mid-row payload truncation w/ slack
                    a = np.load(p)
                    np.save(p, np.concatenate([a, a[:2]]))
                    off, shape, dt, _f = vs.npy_header(p)
                    rb = int(np.prod(shape[1:])) * dt.itemsize
                    with open(p, 'r+b') as f:
                        f.truncate(off + a.shape[0] * rb
                                   + rng.randint(1, rb))
                elif roll == 2 and name == 'video':  # stale recompact
                    from fvt_tpu.preprocess.recompact import \
                        recompact_trial
                    recompact_trial(d, size=48)
                    fut = time.time() + 5
                    os.utime(p, (fut, fut))
        vs.repair(root, constants.MELD)
        post = vs.validate(root, constants.MELD,
                           folds_dir=os.path.join(root, 'folds',
                                                  constants.MELD))
        assert post.as_dict()['ok'], (it, post.as_dict())
        again = vs.repair(root, constants.MELD)
        assert again == [], (it, again)


def test_cli_exit_codes(meld_store, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(repo, 'tools', 'validate_store.py'),
           '--dataset_path', meld_store, '--dataset_name', constants.MELD,
           '--folds_dir', os.path.join(meld_store, 'folds', constants.MELD),
           '--json', str(tmp_path / 'report.json')]
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads((tmp_path / 'report.json').read_text())
    assert report['ok'] and report['counts']['trials_checked'] == 8

    t = _first_trial(meld_store)
    path = os.path.join(_trial_dir(meld_store, t), 'vggish.npy')
    with open(path, 'r+b') as f:
        f.truncate(100)
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r.returncode == 1, r.stdout + r.stderr
