"""Extractor-generation stamping of feature stores.

The stamp (fvt_tpu/preprocess/version.py) must be written by the driver
into every dataset_info/processing_records shard, survive the shard
merge (which refuses mixed generations), and be checked at load time
(experiment.load_dataset_info warns on mismatch/unstamped stores) —
so that documented per-frame definitional refinements (eGeMAPS sma3
placement, centered variance) can never silently mix extractor
generations inside one store.
"""
import os
import pickle
from os.path import join

import pytest

from fvt_tpu.preprocess import version as V
from fvt_tpu.utils.io import load_pickle, save_pickle


def test_stamp_and_check_roundtrip():
    info = V.stamp({'trial': []})
    assert info['extractor_version'] == V.EXTRACTOR_VERSION
    assert V.check(info) is None
    assert 'no extractor_version' in V.check({'trial': []})
    stale = dict(info, extractor_version=V.EXTRACTOR_VERSION - 1)
    msg = V.check(stale, source='x.pkl')
    assert 'x.pkl' in msg and str(V.EXTRACTOR_VERSION - 1) in msg


def test_driver_stamps_shards(tmp_path):
    """A real driver run (empty fold shard) writes the stamp into the
    dataset_info shard pickle."""
    from fvt_tpu.preprocess.driver import PreprocessingDriver

    video_root = tmp_path / 'videos'
    folds = tmp_path / 'folds' / 'split-0'
    os.makedirs(video_root)
    os.makedirs(folds)
    (folds / 'train.txt').write_text('')
    out_root = str(tmp_path / 'out')
    drv = PreprocessingDriver(ds='MELD', split='train', part=0, nparts=1,
                              video_root=str(video_root),
                              output_root=out_root,
                              folds_dir=str(tmp_path / 'folds'))
    drv.run()
    feat = join(out_root, 'features')
    info = load_pickle(join(feat, 'dataset_info_MELD_train_1_0.pkl'))
    assert info['extractor_version'] == V.EXTRACTOR_VERSION


def test_merge_refuses_mixed_generations(tmp_path):
    from fvt_tpu.preprocess.merge import merge_results

    feat = str(tmp_path)
    base = {'trial': ['a'], 'trial_no': [1], 'subject_no': [0],
            'length': [4], 'partition': ['train'],
            'pseudo_partition': ['train'], 'data_folder': 'npy'}
    s0 = V.stamp(dict(base))
    s1 = dict(base, extractor_version=V.EXTRACTOR_VERSION - 1)
    for i, info in enumerate((s0, s1)):
        save_pickle(info, join(feat, f'dataset_info_MELD_train_2_{i}.pkl'))
        save_pickle([{'processing_record': {}}],
                    join(feat, f'processing_records_MELD_train_2_{i}.pkl'))
    with pytest.raises(ValueError, match='generation'):
        merge_results(feat, 'MELD', 'train')
    # the refusal must leave the store untouched: no half-written
    # masters (the records master is merged AFTER the generation check)
    assert not os.path.exists(join(feat, 'dataset_info_MELD_train.pkl'))
    assert not os.path.exists(
        join(feat, 'processing_records_MELD_train.pkl'))

    # same generation merges fine
    save_pickle(V.stamp(dict(base)),
                join(feat, 'dataset_info_MELD_train_2_1.pkl'))
    merged = merge_results(feat, 'MELD', 'train')
    assert merged['extractor_version'] == V.EXTRACTOR_VERSION
    assert merged['trial'] == ['a', 'a']


def test_loader_warns_on_unstamped_store(tmp_path, capsys):
    """experiment.load_dataset_info logs a warning for a pre-stamp store
    and none for a current one."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from types import SimpleNamespace
    from synth_store import make_meld_store
    from fvt_tpu.config.defaults import get_config
    from fvt_tpu.experiment import Experiment

    root = str(tmp_path / 'store')
    make_meld_store(root, n_train=2, n_val=2, n_test=2, min_len=4,
                    max_len=8)
    cfg = get_config('MELD')
    cfg.update(dataset_path=root,
               folds_dir=join(root, 'folds', 'MELD'),
               modality='vggish+bert+EXPR_continuous_label',
               outd=str(tmp_path / 'out'))
    exp = Experiment(SimpleNamespace(**cfg))
    exp.load_dataset_info()
    assert 'WARNING' not in capsys.readouterr().out

    # strip the stamp from one split -> the load warns
    p = join(root, 'features', 'dataset_info_MELD_train.pkl')
    with open(p, 'rb') as f:
        info = pickle.load(f)
    info.pop('extractor_version')
    with open(p, 'wb') as f:
        pickle.dump(info, f)
    exp.load_dataset_info()
    out = capsys.readouterr().out
    assert 'WARNING' in out and 'extractor_version' in out
