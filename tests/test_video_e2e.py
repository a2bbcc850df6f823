"""Raw-video LFAN path: uint8 frames -> device transform -> ArcFace -> fusion."""
import os
from os.path import join

import pytest

from synth_store import make_meld_store


@pytest.mark.slow
def test_lfan_raw_video_trains(tmp_path):
    store = make_meld_store(str(tmp_path / 'store'), n_train=4, n_val=2,
                            n_test=2, min_len=4, max_len=10,
                            with_video=True)
    outd = str(tmp_path / 'exp')
    from fvt_tpu.main import main
    main([
        '--dataset_name', 'MELD',
        '--dataset_path', store['dataset_path'],
        '--folds_dir', store['folds_dir'],
        '--modality', 'video+vggish+bert+EXPR_continuous_label',
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
