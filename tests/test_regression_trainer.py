"""The legacy VA-regression fit loop (train/regression_trainer.py) run
end-to-end on synthetic continuous labels: window-averaged stitching,
CCC-based best selection, the artifact contract (training_logs.csv,
model_state_dict.msgpack, plots), and the reference's early-stopping
counter semantics (base/trainer.py:118-233)."""
import os
from os.path import join
from types import SimpleNamespace

import numpy as np
import pytest

from fvt_tpu import constants
from fvt_tpu.config.defaults import get_config
from fvt_tpu.models.models import LFAN
from fvt_tpu.train.regression_trainer import RegressionTrainer

W, HOP, TRIAL_LEN, NDIM = 8, 4, 20, 128


def _make_args(outd, **over):
    cfg = dict(get_config(constants.MELD))
    cfg.update(num_epochs=12, min_num_epochs=1, early_stopping=0,
               seed=0, outd=str(outd), opt__lr=0.05, save_plot=False,
               milestone=(), load_best_at_each_epoch=False,
               # these tests pin the FIT-LOOP machinery (stitch,
               # selection, release, resume), so they opt into the
               # honored-lr divergence for fast convergence; the
               # reference's silent-default-lr contract is pinned in
               # test_optim.py
               opt__honor_lr=True)
    cfg.update(over)
    return SimpleNamespace(**cfg)


def _synth_trials(n_trials, seed=0):
    """Per-frame label = tanh(mean feature): learnable by the TCN head."""
    rng = np.random.default_rng(seed)
    trials = {}
    for t in range(n_trials):
        x = rng.normal(size=(TRIAL_LEN, NDIM)).astype(np.float32)
        trials[f't{t}'] = (x, np.tanh(x.mean(axis=1)).astype(np.float32))
    return trials


def _window_rows(trials):
    rows = []
    for name, (x, y) in trials.items():
        for s in range(0, TRIAL_LEN - W + 1, HOP):
            idx = np.arange(s, s + W)
            rows.append((name, x[idx], y[idx], idx))
    return rows


def _loader(trials, B=4):
    """Yields (X, trials, lengths, indices) like base/trainer.py:254."""
    rows = _window_rows(trials)
    for i in range(0, len(rows), B):
        chunk = rows[i:i + B]
        yield ({'vggish': np.stack([r[1] for r in chunk]),
                'VA_continuous_label': np.stack([r[2] for r in chunk])},
               [r[0] for r in chunk],
               [TRIAL_LEN] * len(chunk),
               np.stack([r[3] for r in chunk]))


@pytest.fixture(scope='module')
def fitted(tmp_path_factory):
    outd = tmp_path_factory.mktemp('reg_out')
    args = _make_args(outd, save_plot=True)
    model = LFAN(modality=('vggish',), output_dim=1,
                 task=constants.REGRESSION,
                 tcn_dropout=0.0, fusion_dropout=0.0)
    tr = RegressionTrainer(model, args)
    train = _synth_trials(6, seed=0)
    valid = _synth_trials(3, seed=1)
    test = _synth_trials(3, seed=2)
    first = next(_loader(train))[0]
    tr.init_state(first)
    best = tr.fit(lambda epoch: _loader(train), lambda: _loader(valid))
    return tr, best, str(outd), valid, test


def test_fit_learns_and_selects_best(fitted):
    tr, best, outd, valid, _ = fitted
    assert best['ccc'] > 0.1, best
    # fit ends on the best weights: re-evaluating validation reproduces
    # the selected CCC (pins _restore_best + deterministic eval)
    _, perf, _ = tr.loop(_loader(valid), None, train_mode=False)
    assert abs(perf['ccc'] - best['ccc']) < 1e-6


def test_window_average_stitch_roundtrips_labels(fitted):
    """Overlapping windows carry consistent labels, so the handler's
    per-frame averaging must reproduce them exactly
    (base/logger.py:110-119)."""
    tr, _, _, _, test = fitted
    _, _, records = tr.loop(_loader(test), None, train_mode=False)
    for name, (_, y) in test.items():
        np.testing.assert_allclose(records[name]['labels'], y,
                                   rtol=0, atol=1e-7)
        assert records[name]['preds'].shape == y.shape


def test_artifact_contract(fitted):
    tr, _, outd, _, test = fitted
    import csv
    from fvt_tpu.train.regression_viz import CSV_COLUMNS
    assert os.path.isfile(join(outd, 'model_state_dict.msgpack'))
    loss, perf, _ = tr.test(lambda: _loader(test))
    assert set(perf) == {'rmse', 'pcc', 'ccc'} and loss >= 0.0
    with open(join(outd, 'training_logs.csv')) as f:
        rows = list(csv.reader(f))
    assert rows[0] == CSV_COLUMNS
    assert rows[-1][0] == 'Test results:'
    assert len(rows) == 2 + tr.args.num_epochs  # header + epochs + test
    # save_plot artifacts: per-trial validation jpgs + the test pass
    assert os.path.isdir(join(outd, 'plot', 'validate', 'epoch_0'))
    assert sorted(os.listdir(join(outd, 'plot', 'test'))) == \
        ['t0.jpg', 't1.jpg', 't2.jpg']
    # trial-wise records pkls in the reference layout
    # (base/logger.py:354-380): per-epoch train/validate + final test
    import pickle
    for sub in ('train', 'validate'):
        assert os.path.isfile(
            join(outd, 'dict', 'valence', sub, 'epoch_0.pkl'))
    with open(join(outd, 'dict', 'valence', 'test.pkl'), 'rb') as f:
        rec = pickle.load(f)
    assert set(rec) == {'output', 'continuous_label', 'metrics'}
    assert set(rec['output']) == set(test)
    assert abs(rec['metrics']['overall']['ccc'] - perf['ccc']) < 1e-12
    assert set(rec['metrics']['t0']) == {'rmse', 'pcc', 'ccc'}


def test_predict_writes_per_trial_txts(fitted):
    """predict_loop contract (base/trainer.py:318-342): label-free pass,
    predict/<partition>/<emotion>/<trial>.txt with the emotion header,
    values identical to the eval loop's stitched predictions."""
    tr, _, outd, _, test = fitted
    written = tr.predict(lambda: _loader(test), 'test', emotion='valence')
    _, _, records = tr.loop(_loader(test), None, train_mode=False)
    d = join(outd, 'predict', 'test', 'valence')
    assert sorted(os.listdir(d)) == sorted(f'{t}.txt' for t in test)
    for trial in test:
        np.testing.assert_allclose(written[trial],
                                   records[trial]['preds'], atol=0)
        lines = open(join(d, f'{trial}.txt')).read().splitlines()
        assert lines[0] == 'valence' and len(lines) == 1 + TRIAL_LEN
        np.testing.assert_allclose([float(x) for x in lines[1:]],
                                   written[trial], atol=0)


def test_epoch_loss_is_sum_of_batch_means_over_sequences(fitted):
    """base/trainer.py:261+290: running_loss accumulates per-batch MEAN
    losses but divides by the number of SEQUENCES — a reference quirk
    kept verbatim."""
    import jax.numpy as jnp
    from fvt_tpu.train.losses import ccc_loss
    tr, _, _, _, test = fitted
    loss, _, _ = tr.loop(_loader(test), None, train_mode=False)
    expect, n = 0.0, 0
    for X, trials, lengths, indices in _loader(test):
        inputs = {'vggish': jnp.asarray(X['vggish'])}
        out = tr.eval_step(tr.state.params, tr.state.batch_stats, inputs)
        expect += float(ccc_loss(jnp.asarray(X['VA_continuous_label']),
                                 out[..., 0]))
        n += len(trials)
    assert abs(loss - expect / n) < 1e-6


def test_checkpoint_resume_is_exact(tmp_path):
    """An interrupted run resumed from checkpoint.pkl must reproduce the
    uninterrupted run bit-for-bit: TrainState (params, momentum, step
    counter), best snapshot, scheduler and stopping state all round-trip
    (base/checkpointer.py:22-44; deterministic here — dropout is 0 and
    the batch cycle is fixed)."""
    import jax
    train = _synth_trials(4, seed=0)
    valid = _synth_trials(2, seed=1)

    def make(outd, epochs):
        args = _make_args(outd, num_epochs=epochs, min_num_epochs=1)
        model = LFAN(modality=('vggish',), output_dim=1,
                     task=constants.REGRESSION,
                     tcn_dropout=0.0, fusion_dropout=0.0)
        t = RegressionTrainer(model, args)
        t.init_state(next(_loader(train))[0])
        return t

    # straight 6-epoch run
    a = make(tmp_path / 'a', 6)
    best_a = a.fit(lambda e: _loader(train), lambda: _loader(valid))

    # 3 epochs, then a fresh process resumes to 6
    b1 = make(tmp_path / 'b', 3)
    b1.fit(lambda e: _loader(train), lambda: _loader(valid))
    b2 = make(tmp_path / 'b', 6)
    b2.load_checkpoint()
    assert b2.start_epoch == 3
    # phase 1 COMPLETED its (shorter) budget, so it is marked finished;
    # raising the budget and continuing clears the flag (a killed run
    # would resume with fit_finished False automatically)
    assert b2.fit_finished
    b2.fit_finished = False
    best_b = b2.fit(lambda e: _loader(train), lambda: _loader(valid))

    assert best_b['epoch'] == best_a['epoch']
    assert abs(best_b['ccc'] - best_a['ccc']) < 1e-12
    for la, lb in zip(jax.tree.leaves(best_a['params']),
                      jax.tree.leaves(best_b['params'])):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_param_control_release_wiring(tmp_path):
    """Milestone release: the staged 'temporal' group stays FROZEN
    through epoch 0, gets released at the milestone (epoch 1), trains
    afterwards, and the stage round-trips through checkpoint.pkl
    (base/trainer.py:140-149 + ResnetParamControl semantics)."""
    import jax
    from fvt_tpu.train.param_control import ParamControl

    args = _make_args(tmp_path, num_epochs=3, min_num_epochs=1,
                      milestone=(1,))
    model = LFAN(modality=('vggish',), output_dim=1,
                 task=constants.REGRESSION,
                 tcn_dropout=0.0, fusion_dropout=0.0)
    pc = ParamControl([[r'temporal']], release_count=1,
                      base_patterns=[r'fusion', r'regressor', r'bn_'])
    tr = RegressionTrainer(model, args, param_control=pc)
    train = _synth_trials(2, seed=0)
    valid = _synth_trials(1, seed=1)
    tr.init_state(next(_loader(train))[0])

    def leaves(sub):
        return [np.asarray(x) for x in jax.tree.leaves(
            tr.state.params[sub])]

    init_temporal = leaves('temporal_vggish')
    init_head = leaves('regressor')
    probes = {}

    def train_fn(epoch):
        if epoch == 1:  # after epoch 0 trained, milestone just fired
            probes['temporal_still_init'] = all(
                np.array_equal(a, b) for a, b in
                zip(init_temporal, leaves('temporal_vggish')))
            probes['head_moved'] = not all(
                np.array_equal(a, b) for a, b in
                zip(init_head, leaves('regressor')))
        return _loader(train)

    tr.fit(train_fn, lambda: _loader(valid))
    assert probes == {'temporal_still_init': True, 'head_moved': True}
    assert pc.released == 1 and not pc.early_stop
    # released group trained during epochs 1-2
    assert not all(np.array_equal(a, b) for a, b in
                   zip(init_temporal, leaves('temporal_vggish')))

    # stage survives resume: the wrapped opt-state template matches
    t2 = RegressionTrainer(model, args,
                           param_control=ParamControl(
                               [[r'temporal']], release_count=1,
                               base_patterns=[r'fusion', r'regressor',
                                              r'bn_']))
    t2.init_state(next(_loader(train))[0])
    t2.load_checkpoint()
    assert t2.param_control.released == 1
    for a, b in zip(jax.tree.leaves(tr.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_uncovered_frames_raise(tmp_path):
    """A window plan that leaves trial frames uncovered must fail
    loudly (the reference's handler would crash on the empty per-frame
    list), not fabricate (0, 0) pairs into the metrics."""
    import pytest as _pytest
    args = _make_args(tmp_path, num_epochs=1)
    model = LFAN(modality=('vggish',), output_dim=1,
                 task=constants.REGRESSION,
                 tcn_dropout=0.0, fusion_dropout=0.0)
    tr = RegressionTrainer(model, args)
    trials = _synth_trials(1, seed=0)
    tr.init_state(next(_loader(trials))[0])

    def gappy():
        for X, names, lengths, indices in _loader(trials):
            yield X, names, [TRIAL_LEN + 5] * len(names), indices

    with _pytest.raises(ValueError, match='covered by no window'):
        tr.loop(gappy(), None, train_mode=False)


def test_early_stopping_counter_semantics(tmp_path):
    """Scripted validation CCCs: improvement only at epoch 0; with
    early_stopping=2 and min_num_epochs=0 the counter decrements at
    epochs 1 and 2, fit_finished fires, and epoch 3 breaks before
    running (base/trainer.py:135-139+213-221)."""
    args = _make_args(tmp_path, num_epochs=8, min_num_epochs=0,
                      early_stopping=2)
    model = LFAN(modality=('vggish',), output_dim=1,
                 task=constants.REGRESSION,
                 tcn_dropout=0.0, fusion_dropout=0.0)
    tr = RegressionTrainer(model, args)
    tr.init_state(next(_loader(_synth_trials(1)))[0])

    script = iter([0.5, 0.5, 0.4, 0.3, 0.2, 0.2, 0.2, 0.2,
                   0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2])
    calls = {'train': 0}

    def fake_loop(loader, epoch, train_mode):
        if train_mode:
            calls['train'] += 1
            return 1.0, {'rmse': 1., 'pcc': 0., 'ccc': 0.}, {}
        c = next(script)
        return 1.0, {'rmse': 1., 'pcc': 0., 'ccc': c}, {}

    tr.loop = fake_loop
    best = tr.fit(lambda epoch: None, lambda: None)
    # epoch 0 improves (0.5 > -1e10); epochs 1-2 don't -> counter 2->1->0
    assert calls['train'] == 3
    assert best['epoch'] == 0 and abs(best['ccc'] - 0.5) < 1e-12
