"""Synthetic on-disk feature store matching the reference disk contract.

Creates features/compacted_48/<trial>/{vggish,bert,EXPR_continuous_label}.npy,
dataset_info_{ds}_{split}.pkl and folds/<ds>/split-0/ — enough to run the
full training CLI without any real data (the reference's train_p smoke-test
strategy, done properly).
"""
from __future__ import annotations

import os
from os.path import join

import numpy as np
import yaml

from fvt_tpu import constants
from fvt_tpu.preprocess.version import stamp
from fvt_tpu.utils.io import save_pickle

CLASSES = [constants.SURPRISE, constants.FEAR, constants.DISGUST,
           constants.SADNESS, constants.HAPPINESS, constants.ANGER,
           constants.NEUTRAL]

COMPOUND_CLASSES = [
    constants.FEARFULLY_SURPRISED, constants.HAPPILY_SURPRISED,
    constants.SADLY_SURPRISED, constants.DISGUSTEDLY_SURPRISED,
    constants.ANGRILY_SURPRISED, constants.SADLY_FEARFUL,
    constants.SADLY_ANGRY, constants.OTHER,
]


def _observed_label(rng, label, ncls, label_noise):
    """With prob ``label_noise`` record a WRONG label (uniform over the
    other classes) while the features stay drawn from the true class —
    the irreducible-error knob that pins the converged W-F1 to ~
    (1 - label_noise) instead of 1.0 (round-4 verdict: a 0.0 accuracy
    delta at a saturated ceiling carries no information)."""
    if label_noise > 0 and rng.random() < label_noise:
        return int((label + 1 + rng.integers(0, ncls - 1)) % ncls)
    return label


def _video_hardness(rng, label, ncls, ambiguity, label_noise):
    """ONE per-video draw of (ambiguous_partner, observed_label).

    Ambiguity is a property of the VIDEO: when it fires, the SAME
    partner class blends into every modality's features (independent
    per-modality draws would leave ~a third of 'ambiguous' videos with
    one clean modality the fusion model can fall back on, making the
    store materially easier than the knob states)."""
    partner = None
    if ambiguity > 0 and rng.random() < ambiguity:
        partner = int((label + 1 + rng.integers(0, ncls - 1)) % ncls)
    obs = _observed_label(rng, label, ncls, label_noise)
    return partner, obs


def _class_center(centers, label, partner):
    """Feature center for one modality: the class center, or the
    midpoint with the video's ambiguity partner — genuinely uncertain
    videos whose predictions depend on the learned boundary."""
    if partner is not None:
        return 0.5 * (centers[label] + centers[partner])
    return centers[label]


def make_cexpr_store(root: str, ds: str = constants.C_EXPR_DB,
                     n_train=10, n_val=5, min_len=8, max_len=40,
                     seed=0, separation=3.0, video_hw=8,
                     label_noise=0.0, ambiguity=0.0, n_folds=1):
    """C-EXPR-DB / challenge-shaped store.

    Both datasets require a per-trial video.npy (the arranger trusts its
    length, base/dataset.py:400-409).  The challenge store has only a
    'train' dataset_info (aliased to valid/test by the Experiment) and
    long videos to exercise the window-stitch path.
    """
    rng = np.random.default_rng(seed)
    ncls = 8  # 7 compound + Other
    feat_dir = join(root, 'features', 'compacted_48')
    folds_dir = join(root, 'folds', ds, 'split-0')
    os.makedirs(folds_dir, exist_ok=True)

    centers_v = rng.normal(size=(ncls, 128)) * separation
    centers_b = rng.normal(size=(ncls, 768)) * separation

    if ds == constants.C_EXPR_DB:
        counts = {constants.TRAINSET: n_train, constants.VALIDSET: n_val}
    else:
        counts = {constants.TRAINSET: n_train}

    for split, n in counts.items():
        trials, lengths, lines = [], [], []
        for i in range(n):
            trial = f"{split}/vid{i}"
            label = int(rng.integers(0, ncls))
            length = int(rng.integers(min_len, max_len + 1))
            tdir = join(feat_dir, trial)
            os.makedirs(tdir, exist_ok=True)

            partner, obs = _video_hardness(rng, label, ncls, ambiguity,
                                           label_noise)
            cen_v = _class_center(centers_v, label, partner)
            cen_b = _class_center(centers_b, label, partner)
            np.save(join(tdir, 'video.npy'),
                    rng.integers(0, 255, size=(length, video_hw, video_hw,
                                               3)).astype(np.uint8))
            np.save(join(tdir, 'vggish.npy'),
                    (cen_v + rng.normal(size=(length, 128))
                     ).astype(np.float32))
            np.save(join(tdir, 'bert.npy'),
                    (cen_b + rng.normal(size=(length, 768))
                     ).astype(np.float32))
            np.save(join(tdir, 'EXPR_continuous_label.npy'),
                    np.full((length,), obs, dtype=np.int64))

            trials.append(trial)
            lengths.append(length)
            lines.append(f"{trial},{obs},compound transcript {i}")

        save_pickle(stamp({'data_folder': 'compacted_48', 'trial': trials,
                           'length': lengths, 'partition': split}),
                    join(root, 'features', f"dataset_info_{ds}_{split}.pkl"))
        with open(join(folds_dir, f"{split}.txt"), 'w') as f:
            f.write('\n'.join(lines) + '\n')

    # test.txt == val.txt for C-EXPR-DB; challenge uses train.txt only
    if ds == constants.C_EXPR_DB:
        import shutil
        shutil.copy(join(folds_dir, 'val.txt'),
                    join(folds_dir, 'test.txt'))
    else:
        import shutil
        for s in (constants.VALIDSET, constants.TESTSET):
            shutil.copy(join(folds_dir, 'train.txt'),
                        join(folds_dir, f'{s}.txt'))

    with open(join(folds_dir, 'class_id.yaml'), 'w') as f:
        yaml.dump({c: i for i, c in enumerate(COMPOUND_CLASSES)}, f)

    # k-fold CV splits (C-EXPR-DB's 5-fold layout, folds/ tree of the
    # reference): split-k re-partitions the SAME trial pool — fold txts
    # are the split-membership authority; the arranger pools every
    # partition's dataset_info and filters by them (data/arranger.py:
    # 65-87), so a val-partition trial can serve in split-1's train set
    if n_folds > 1:
        assert ds == constants.C_EXPR_DB, (
            f'n_folds>1 is only defined for the C-EXPR-DB CV layout; '
            f'got ds={ds!r} — a silently-missing split-1..k would fail '
            f'far from here at --fold_to_run time')
        all_lines = []
        for split in counts:
            with open(join(folds_dir, f'{split}.txt')) as f:
                all_lines += [ln for ln in f.read().splitlines() if ln]
        frng = np.random.default_rng(seed + 1)
        order = frng.permutation(len(all_lines))
        chunks = np.array_split(order, n_folds)
        for k in range(n_folds):
            fd = join(root, 'folds', ds, f'split-{k}')
            os.makedirs(fd, exist_ok=True)
            val_idx = set(chunks[k].tolist())
            val = [all_lines[i] for i in sorted(val_idx)]
            train = [all_lines[i] for i in range(len(all_lines))
                     if i not in val_idx]
            for name, lines_k in (('train', train), ('val', val),
                                  ('test', val)):
                with open(join(fd, f'{name}.txt'), 'w') as f:
                    f.write('\n'.join(lines_k) + '\n')
            with open(join(fd, 'class_id.yaml'), 'w') as f:
                yaml.dump({c: i for i, c in enumerate(COMPOUND_CLASSES)},
                          f)

    return {'dataset_path': root, 'folds_dir': join(root, 'folds', ds)}


def make_meld_store(root: str, n_train=12, n_val=6, n_test=6,
                    min_len=8, max_len=40, ncls=7, seed=0,
                    separation=3.0, with_video=False,
                    label_noise=0.0, ambiguity=0.0):
    """Label-separable synthetic vggish/bert streams (learnable quickly).

    ``label_noise`` / ``ambiguity`` > 0 make the store NON-separable
    (wrong recorded labels / class-midpoint feature manifolds) so the
    converged W-F1 has real dynamic range — the operating point the
    accuracy-equivalence twins (tools/twin_accuracy.py) need."""
    rng = np.random.default_rng(seed)
    ds = constants.MELD
    feat_dir = join(root, 'features', 'compacted_48')
    folds_dir = join(root, 'folds', ds, 'split-0')
    os.makedirs(folds_dir, exist_ok=True)

    class_centers_v = rng.normal(size=(ncls, 128)) * separation
    class_centers_b = rng.normal(size=(ncls, 768)) * separation

    counts = {constants.TRAINSET: n_train, constants.VALIDSET: n_val,
              constants.TESTSET: n_test}
    for split, n in counts.items():
        trials, lengths, lines = [], [], []
        for i in range(n):
            trial = f"{split}/v{i}"
            label = int(rng.integers(0, ncls))
            length = int(rng.integers(min_len, max_len + 1))
            tdir = join(feat_dir, trial)
            os.makedirs(tdir, exist_ok=True)

            partner, obs = _video_hardness(rng, label, ncls, ambiguity,
                                           label_noise)
            cen_v = _class_center(class_centers_v, label, partner)
            cen_b = _class_center(class_centers_b, label, partner)
            vggish = (cen_v
                      + rng.normal(size=(length, 128))).astype(np.float32)
            bert = (cen_b
                    + rng.normal(size=(length, 768))).astype(np.float32)
            labels = np.full((length,), obs, dtype=np.int64)
            np.save(join(tdir, 'vggish.npy'), vggish)
            np.save(join(tdir, 'bert.npy'), bert)
            np.save(join(tdir, 'EXPR_continuous_label.npy'), labels)
            if with_video:
                video = rng.integers(
                    0, 255, size=(length, 64, 64, 3)).astype(np.uint8)
                np.save(join(tdir, 'video.npy'), video)

            trials.append(trial)
            lengths.append(length)
            lines.append(f"{trial},{obs},synthetic transcript {i}")

        save_pickle(stamp({'data_folder': 'compacted_48', 'trial': trials,
                           'length': lengths, 'partition': split}),
                    join(root, 'features', f"dataset_info_{ds}_{split}.pkl"))
        with open(join(folds_dir, f"{split}.txt"), 'w') as f:
            f.write('\n'.join(lines) + '\n')

    with open(join(folds_dir, 'class_id.yaml'), 'w') as f:
        yaml.dump({c: i for i, c in enumerate(CLASSES[:ncls])}, f)

    return {'dataset_path': root, 'folds_dir': join(root, 'folds', ds)}


def add_logmel_features(root: str, ds: str = constants.MELD, seed=0):
    """Add logmel.npy (T, 96, 64) float16 patches to every trial of an
    existing store (the raw-audio modality consumed by the VGGish
    backbone in-model, configs.py:57)."""
    rng = np.random.default_rng(seed)
    feat_dir = join(root, 'features', 'compacted_48')
    for split_dir in os.listdir(feat_dir):
        sd = join(feat_dir, split_dir)
        for trial in os.listdir(sd):
            tdir = join(sd, trial)
            n = np.load(join(tdir, 'EXPR_continuous_label.npy')).shape[0]
            logmel = rng.normal(size=(n, 96, 64)).astype(np.float16)
            np.save(join(tdir, 'logmel.npy'), logmel)
