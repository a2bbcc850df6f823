"""C-EXPR-DB (use_other_class) training + challenge window-stitch eval."""
import os
import pickle
from os.path import join

import numpy as np
import pytest

from fvt_tpu import constants
from synth_store import make_cexpr_store


def test_cexpr_other_class_training(tmp_path):
    store = make_cexpr_store(str(tmp_path / 'store'), n_train=10, n_val=5,
                             min_len=8, max_len=30)
    outd = str(tmp_path / 'exp')
    from fvt_tpu.main import main
    main([
        '--dataset_name', 'C-EXPR-DB',
        '--dataset_path', store['dataset_path'],
        '--folds_dir', store['folds_dir'],
        '--modality', 'vggish+bert+EXPR_continuous_label',
        '--model_name', 'LFAN',
        '--num_epochs', '1',
        '--train_batch_size', '4',
        '--num_workers', '1',
        '--window_length', '12',
        '--hop_length', '8',
        '--eval_bucket_quantum', '12',
        '--outd', outd,
        '--use_other_class', 'true',
    ])
    assert os.path.isfile(join(outd, 'passed.txt'))
    # selection criteria: frame-level W_F1 per ignore-class {None, 7}
    items = sorted(os.listdir(join(outd, 'best-models')))
    assert items == ['7', 'None']
    with open(join(outd, 'test-None-perf.pkl'), 'rb') as f:
        perf = pickle.load(f)
    assert set(perf.keys()) == {None, 7}
    # with Other included the model head has 8 classes
    with open(join(outd, f'pred-per-frame-test-None-perf.pkl'), 'rb') as f:
        per_video = pickle.load(f)
    any_v = next(iter(per_video.values()))
    assert any_v['logits'].shape[1] == 8


def test_challenge_window_stitch_inference(tmp_path):
    # long videos (>> window) force the LFAN stitch path end to end
    store = make_cexpr_store(str(tmp_path / 'store'),
                             ds='C-EXPR-DB-CHALLENGE',
                             n_train=3, min_len=40, max_len=70)

    # first: train a tiny MELD-config model to get a finished run dir
    from synth_store import make_meld_store
    meld = make_meld_store(str(tmp_path / 'meld'), n_train=6, n_val=3,
                           n_test=3, min_len=6, max_len=16)
    outd = str(tmp_path / 'exp')
    from fvt_tpu.main import main
    main([
        '--dataset_name', 'MELD',
        '--dataset_path', meld['dataset_path'],
        '--folds_dir', meld['folds_dir'],
        '--modality', 'vggish+bert+EXPR_continuous_label',
        '--model_name', 'LFAN',
        '--num_epochs', '1',
        '--train_batch_size', '4',
        '--num_workers', '1',
        '--window_length', '16',
        '--hop_length', '8',
        '--eval_bucket_quantum', '16',
        '--outd', outd,
    ])

    # challenge inference via the EVALUATION CLI (frozen-config reload)
    from fvt_tpu.inference_challenge import main as eval_main
    eval_main([
        '--mode', 'EVALUATION',
        '--fd_exp', outd,
        '--target_ds_name', 'C-EXPR-DB-CHALLENGE',
        '--dataset_path', store['dataset_path'],
        '--folds_dir', store['folds_dir'],
        '--case_best_model', constants.FRM_AVG_LOGITS,
    ])

    eval_dir = join(outd, 'eval-C-EXPR-DB-CHALLENGE')
    pred_path = join(eval_dir, 'pred-C-EXPR-DB-CHALLENGE',
                     'prediction.pkl')
    assert os.path.isfile(pred_path)
    with open(pred_path, 'rb') as f:
        preds = pickle.load(f)
    assert len(preds) == 3
    for vid, rec in preds.items():
        # per-frame logits cover the FULL video length (stitched), window=16
        assert rec['logits'].shape[0] == rec['labels'].shape[0]
        assert rec['logits'].shape[0] >= 40
        assert np.isfinite(rec['logits']).all()


def test_stitch_path_matches_reference_loop(tmp_path):
    """The Trainer's batched stitch == a per-window forward + Counter-divide
    loop (reference trainer.py:832-892 semantics) on the same model."""
    import jax
    import jax.numpy as jnp
    from fvt_tpu.models.models import LFAN
    from fvt_tpu.data.windowing import windowing
    from fvt_tpu.train.trainer import Trainer
    from fvt_tpu.config.defaults import get_config, to_namespace

    cfg = get_config(constants.MELD)
    cfg.update(window_length=16, hop_length=8, dataset_path='x')
    args = to_namespace(cfg)

    model = LFAN(modality=('vggish', 'bert'), output_dim=7)
    trainer = Trainer(model, constants.LFAN, args, {}, {})
    rng = np.random.default_rng(0)
    L = 50
    batch = {
        'vggish': rng.normal(size=(1, L, 128)).astype(np.float32),
        'bert': rng.normal(size=(1, L, 768)).astype(np.float32),
    }
    trainer.init_state({k: jnp.asarray(v) for k, v in batch.items()})

    got = trainer._forward_windows(batch, true_len=L)

    # oracle: python loop over windows + scatter/divide
    windows = windowing(np.arange(L), 16, 8)
    final = np.zeros((L, 7), np.float32)
    counts = np.zeros((L,), np.float32)
    for wd in windows:
        chunk = {k: jnp.asarray(v[:, wd]) for k, v in batch.items()}
        out = np.asarray(trainer.eval_step(
            trainer.state.params, trainer.state.batch_stats, chunk))[0]
        final[wd] += out
        counts[wd] += 1
    final /= counts[:, None]

    np.testing.assert_allclose(got, final, rtol=1e-4, atol=1e-5)
