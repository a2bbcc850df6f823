"""Serving-path (Pallas TCN) forward == flax model.apply (eval mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from fvt_tpu import constants
from fvt_tpu.models.models import LFAN
from fvt_tpu.serve import build_lfan_serving_fn


def test_lfan_serving_matches_model_apply():
    model = LFAN(modality=('vggish', 'bert'), output_dim=7)
    rng = np.random.default_rng(0)
    batch = {
        'vggish': jnp.asarray(rng.normal(size=(2, 32, 128)
                                         ).astype(np.float32)),
        'bert': jnp.asarray(rng.normal(size=(2, 32, 768)
                                       ).astype(np.float32)),
    }
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), batch)

    want = model.apply(variables, batch, train=False)
    serve_fn = build_lfan_serving_fn(model, variables, interpret=True)
    got = serve_fn(batch)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_lfan_serving_logmel_rides_vggish():
    """Raw log-mel patches must pass through the frozen VGGish backbone in
    the serving path too (not straight into the TCN kernel)."""
    from fvt_tpu.models.vggish import VGGish

    model = LFAN(modality=('logmel', 'bert'), output_dim=7,
                 spatial_audio=VGGish())
    rng = np.random.default_rng(1)
    batch = {
        'logmel': jnp.asarray(rng.normal(size=(1, 8, 96, 64)
                                         ).astype(np.float32)),
        'bert': jnp.asarray(rng.normal(size=(1, 8, 768)
                                       ).astype(np.float32)),
    }
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), batch)

    want = model.apply(variables, batch, train=False)
    serve_fn = build_lfan_serving_fn(model, variables, interpret=True)
    got = serve_fn(batch)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_trainer_pallas_serving_inference(tmp_path):
    """--pallas_serving true eval path through the full CLI matches the
    standard path's predictions within kernel tolerance."""
    import os
    import pickle
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_store import make_meld_store
    from fvt_tpu.main import main

    store = make_meld_store(str(tmp_path / 'store'), n_train=6, n_val=3,
                            n_test=3, min_len=6, max_len=16)
    base = [
        '--dataset_name', 'MELD',
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
        '--seed', '0',
    ]
    main(base + ['--outd', str(tmp_path / 'xla')])
    main(base + ['--outd', str(tmp_path / 'pallas'),
                 '--pallas_serving', 'true'])

    def load(d):
        with open(os.path.join(
                d, 'pred-per-frame-test-FRAMES_VOTE-perf.pkl'),
                'rb') as f:
            return pickle.load(f)

    a, b = load(str(tmp_path / 'xla')), load(str(tmp_path / 'pallas'))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k]['logits'], b[k]['logits'],
                                   rtol=5e-3, atol=5e-4)
