"""Regression task path: tanh head + CCC loss train step + metrics."""
import numpy as np
import jax
import jax.numpy as jnp

from fvt_tpu import constants
from fvt_tpu.models.models import LFAN
from fvt_tpu.train.steps import create_train_state, make_train_step
from fvt_tpu.train import optim
from fvt_tpu.train.metrics import compute_regression_perf
from fvt_tpu.config.defaults import get_config


def test_regression_train_step_decreases_ccc_loss():
    hp = optim.standardize_opt_params(get_config(constants.MELD))
    hp.lr = 0.05
    optimizer = optim.build_optimizer(hp)
    model = LFAN(modality=('vggish',), output_dim=1,
                 task=constants.REGRESSION,
                 tcn_dropout=0.0, fusion_dropout=0.0)

    rng = np.random.default_rng(0)
    T = 32
    x = rng.normal(size=(4, T, 128)).astype(np.float32)
    # target correlated with input mean per frame
    y = np.tanh(x.mean(axis=2))
    batch = {'vggish': jnp.asarray(x),
             constants.EXPR: jnp.asarray(y.astype(np.float32))}

    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    step = make_train_step(model, optimizer, task=constants.REGRESSION)

    losses = []
    for i in range(12):
        state, loss = step(state, batch, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # outputs are tanh-bounded
    out = model.apply({'params': state.params,
                       'batch_stats': state.batch_stats},
                      {'vggish': jnp.asarray(x)}, train=False)
    assert float(jnp.abs(out).max()) <= 1.0


def test_regression_perf_metrics():
    rng = np.random.default_rng(1)
    data = {}
    for i in range(5):
        g = rng.normal(size=(40,))
        data[f'v{i}'] = {'labels': g, 'preds': g * 0.9 + 0.05}
    perf = compute_regression_perf(data)
    assert perf['rmse'] < 0.3
    assert perf['pcc'] > 0.95
    assert 0.9 < perf['ccc'] <= 1.0

    ident = {k: {'labels': v['labels'], 'preds': v['labels']}
             for k, v in data.items()}
    p = compute_regression_perf(ident)
    # reference quirk (base/logger.py:232-246): ddof=0 covariance over
    # ddof=1 variances, so identical arrays score (n-1)/n — NOT 1.0
    n = sum(len(v['labels']) for v in data.values())
    assert abs(p['ccc'] - (n - 1) / n) < 1e-9 and p['rmse'] < 1e-12


def test_regression_metrics_parity_vs_reference():
    """rmse/pcc/ccc equal the IMPORTED reference's
    ContinuousMetricsCalculator.calculator on the same concatenated
    arrays — the 'overall' partition-wise semantics of
    /root/reference/base/logger.py:314-346 (ccc notably mixes a ddof=0
    covariance with Matlab-nanvar ddof=1 variances, logger.py:232-246)."""
    from conftest import add_reference_to_path
    add_reference_to_path()
    from base.logger import ContinuousMetricsCalculator as RefCalc

    rng = np.random.default_rng(3)
    data = {}
    for i in range(4):
        T = int(rng.integers(20, 61))
        lab = rng.uniform(-1.0, 1.0, size=T)
        data[f'vid{i}'] = {'labels': lab,
                           'preds': np.tanh(lab + 0.3 * rng.normal(size=T))}
    perf = compute_regression_perf(data)

    preds = np.concatenate([d['preds'] for d in data.values()])
    golds = np.concatenate([d['labels'] for d in data.values()])
    ref_rmse = RefCalc.calculator(None, preds, golds, 'rmse')
    ref_pcc = RefCalc.calculator(None, preds, golds, 'pcc')
    ref_ccc = RefCalc.calculator(None, preds, golds, 'ccc')
    assert abs(perf['rmse'] - float(ref_rmse)) < 1e-12, (perf, ref_rmse)
    assert abs(perf['pcc'] - float(ref_pcc[0])) < 1e-12, (perf, ref_pcc)
    assert abs(perf['ccc'] - float(ref_ccc)) < 1e-12, (perf, ref_ccc)


def test_regression_viz_artifacts(tmp_path):
    """Legacy regression viz contract: per-trial output-vs-label jpgs in
    the reference's plot/<mode>/epoch_<e>/ layout (base/logger.py:130-200)
    and the training_logs.csv epoch rows (base/checkpointer.py:52-90)."""
    import csv as _csv
    import os
    from fvt_tpu.train import regression_viz as RV
    from fvt_tpu.train.metrics import compute_regression_perf

    rng = np.random.default_rng(0)
    per_video = {f'v{i}': {'labels': rng.normal(size=(30,)),
                           'preds': rng.normal(size=(30,))}
                 for i in range(3)}
    perf = compute_regression_perf(per_video)

    outd = str(tmp_path)
    d = RV.save_output_vs_label_plots(per_video, perf, outd, epoch=2,
                                      train_mode=False)
    assert d.endswith(os.path.join('plot', 'validate', 'epoch_2'))
    assert sorted(os.listdir(d)) == ['v0.jpg', 'v1.jpg', 'v2.jpg']
    d = RV.save_output_vs_label_plots(per_video, perf, outd, epoch=None)
    assert d.endswith(os.path.join('plot', 'test'))

    RV.init_epoch_csv(outd)
    RV.append_epoch_csv(outd, epoch=0, best_epoch=0, lr=1e-3,
                        tr_loss=0.5, val_loss=0.6,
                        train_perf=perf, valid_perf=perf)
    RV.append_epoch_csv(outd, epoch=1, best_epoch=1, lr=1e-3,
                        tr_loss=0.4, val_loss=0.5,
                        train_perf=perf, valid_perf=perf)
    RV.append_test_csv(outd, perf)
    with open(os.path.join(outd, 'training_logs.csv')) as f:
        rows = list(_csv.reader(f))
    assert rows[0] == RV.CSV_COLUMNS
    assert len(rows) == 4 and rows[3][0] == 'Test results:'
    assert float(rows[1][1]) == 0 and float(rows[2][1]) == 1
