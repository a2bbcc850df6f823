"""Fold creation / dumping / MELD csv simplification."""
import os
from os.path import join

import numpy as np
import yaml

from fvt_tpu import constants
from fvt_tpu.preprocess import splits as S
from fvt_tpu.data.folds import load_fold_txt, load_class_id


def test_kfold_splits_stratified_and_disjoint():
    clips_per_class = {f'cl{c}': [f'v{c}_{i}' for i in range(11 + c)]
                      for c in range(7)}
    splits = S.kfold_splits(clips_per_class, n=5, seed=0)
    assert len(splits) == 5
    all_clips = {c for v in clips_per_class.values() for c in v}
    for k, sp in splits.items():
        train = set(sp[constants.TRAINSET])
        valid = set(sp[constants.VALIDSET])
        assert not train & valid
        assert train | valid == all_clips
    # every clip appears in exactly one valid fold
    valid_union = sum((sp[constants.VALIDSET] for sp in splits.values()),
                      [])
    assert sorted(valid_union) == sorted(all_clips)


def test_dump_fold_files_roundtrip(tmp_path):
    clips_per_class = {'a': ['x0', 'x1', 'x2'], 'b': ['y0', 'y1']}
    labels = {'x0': 0, 'x1': 0, 'x2': 0, 'y0': 1, 'y1': 1}
    transcripts = {'x0': 'hello, with comma', 'y0': 'plain'}
    splits = S.kfold_splits(clips_per_class, n=2, seed=1)
    folds_dir = str(tmp_path / 'folds')
    S.dump_fold_files(splits, labels, {'a': 0, 'b': 1}, folds_dir,
                      transcripts)

    fold = load_fold_txt(join(folds_dir, 'split-0', 'train.txt'))
    for vid, rec in fold.items():
        assert rec['cl'] == labels[vid]
    # transcript with comma survives the roundtrip
    all_recs = {}
    for k in (0, 1):
        for s in ('train', 'val', 'test'):
            all_recs.update(load_fold_txt(
                join(folds_dir, f'split-{k}', f'{s}.txt')))
    assert all_recs['x0']['txt'] == 'hello, with comma'
    assert load_class_id(folds_dir, 0) == {'a': 0, 'b': 1}


def test_simplify_meld_csv(tmp_path):
    csv_path = str(tmp_path / 'dev.csv')
    with open(csv_path, 'w', encoding='utf-8') as f:
        f.write('Sr No.,Utterance,Speaker,Emotion,Dialogue_ID,'
                'Utterance_ID\n')
        f.write('1,Hello world,Joey,neutral,0,0\n')
        f.write('2,"Also, a comma",Ross,anger,0,1\n')
        f.write('3,corrupted one,X,sadness,1,0\n')
    out = str(tmp_path / 'simple.csv')
    rows = S.simplify_meld_csv(csv_path, out, corrupted=['dia1_utt0'])
    assert len(rows) == 2
    assert rows[0]['video'] == 'dia0_utt0'
    assert rows[1]['utterance'] == 'Also, a comma'
    assert os.path.isfile(out)
