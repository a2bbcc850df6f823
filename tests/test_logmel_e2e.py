"""logmel modality: raw log-mel patches through the in-model VGGish."""
import os
from os.path import join

import pytest

from synth_store import make_meld_store, add_logmel_features


@pytest.mark.slow
def test_lfan_logmel_trains(tmp_path):
    store = make_meld_store(str(tmp_path / 'store'), n_train=4, n_val=2,
                            n_test=2, min_len=4, max_len=10)
    add_logmel_features(store['dataset_path'])
    outd = str(tmp_path / 'exp')
    from fvt_tpu.main import main
    main([
        '--dataset_name', 'MELD',
        '--dataset_path', store['dataset_path'],
        '--folds_dir', store['folds_dir'],
        '--modality', 'logmel+bert+EXPR_continuous_label',
        '--model_name', 'LFAN',
        '--num_epochs', '1',
        '--train_batch_size', '2',
        '--num_workers', '1',
        '--window_length', '6',
        '--hop_length', '4',
        '--eval_bucket_quantum', '6',
        '--outd', outd,
    ])
    assert os.path.isfile(join(outd, 'passed.txt'))
