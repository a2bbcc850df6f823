"""Parse the reference's actual fold files: exact dataset-size fidelity.

MELD 9988/1108/2610 train/val/test; C-EXPR-DB 5 folds of 98/27;
challenge 56 test videos (SURVEY §0).
"""
import os
from os.path import join

import pytest

from fvt_tpu import constants
from fvt_tpu.data.folds import load_fold_txt, load_class_id

REF_FOLDS = '/root/reference/folds'

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_FOLDS),
                                reason='reference folds not mounted')


def test_meld_fold_counts():
    d = join(REF_FOLDS, 'MELD', 'split-0')
    train = load_fold_txt(join(d, 'train.txt'))
    val = load_fold_txt(join(d, 'val.txt'))
    test = load_fold_txt(join(d, 'test.txt'))
    assert len(train) == 9988
    assert len(val) == 1108
    assert len(test) == 2610
    cls = load_class_id(join(REF_FOLDS, 'MELD'), 0)
    assert len(cls) == 7
    assert set(v['cl'] for v in train.values()) <= set(cls.values())
    # transcripts survive commas
    assert all(isinstance(v['txt'], str) for v in train.values())


def test_cexpr_fold_counts():
    for k in range(5):
        d = join(REF_FOLDS, 'C-EXPR-DB', f'split-{k}')
        train = load_fold_txt(join(d, 'train.txt'))
        val = load_fold_txt(join(d, 'val.txt'))
        # 125 annotated clips split 5-fold (fold sizes vary 22-27)
        assert len(train) + len(val) == 125, (k, len(train), len(val))
        assert 22 <= len(val) <= 27, (k, len(val))
        assert not set(train) & set(val)
    cls = load_class_id(join(REF_FOLDS, 'C-EXPR-DB'), 0)
    assert cls[constants.OTHER] == 7
    assert len(cls) == 8


def test_challenge_fold_counts():
    d = join(REF_FOLDS, 'C-EXPR-DB-CHALLENGE', 'split-0')
    for split in ('train', 'val', 'test'):
        p = join(d, f'{split}.txt')
        if os.path.isfile(p):
            fold = load_fold_txt(p)
            assert len(fold) == 56, (split, len(fold))


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get('FVT_INTEROP') != '1',
                    reason='full reference-interop run is opt-in '
                           '(FVT_INTEROP=1); ~4 min')
def test_full_reference_interop(tmp_path):
    """The reference pipeline trains on an fvt_tpu store and its
    checkpoint reproduces in fvt_tpu at fp32 tolerance."""
    import sys
    sys.path.insert(0, join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tools'))
    from reference_interop import main as interop_main
    maxd = interop_main(str(tmp_path / 'interop'))
    assert maxd < 1e-4
