"""Example-assembly parity vs the reference GenericDataset.__getitem__:
mmap slicing, pad-by-repeat, and train-stat normalization must agree to
the float."""
import os
from os.path import join

import numpy as np
import pytest

from conftest import add_reference_to_path

add_reference_to_path()

from fvt_tpu import constants  # noqa: E402
from fvt_tpu.config import model_config as MC  # noqa: E402
from fvt_tpu.data.dataset import ExampleBuilder  # noqa: E402


def _store(tmp_path, length):
    rng = np.random.default_rng(length)
    tdir = str(tmp_path / f'trial{length}')
    os.makedirs(tdir)
    np.save(join(tdir, 'vggish.npy'),
            rng.normal(size=(length, 128)).astype(np.float32))
    np.save(join(tdir, 'bert.npy'),
            rng.normal(size=(length, 768)).astype(np.float32))
    np.save(join(tdir, 'EXPR_continuous_label.npy'),
            rng.integers(0, 7, size=(length,)).astype(np.int64))
    return tdir


@pytest.mark.parametrize('length,window', [(40, 16), (10, 16), (16, 16)])
def test_example_assembly_matches_reference(tmp_path, length, window):
    from dataset import Dataset as RefDataset

    mean_std = {
        f: {'mean': np.random.default_rng(1).normal(size=(d,)),
            'std': np.abs(np.random.default_rng(2).normal(size=(d,)))
            + 0.5}
        for f, d in [('vggish', 128), ('bert', 768)]
    }

    tdir = _store(tmp_path, length)
    index = np.arange(min(length, window))
    item = [tdir, 'trial', length, index]

    modality = ['vggish', 'bert', constants.EXPR]
    ref_ds = RefDataset(
        data_list=[item],
        continuous_label_dim=[0],
        modality=modality,
        multiplier=MC.MULTIPLIER,
        feature_dimension={k: tuple(v) for k, v in
                           MC.FEATURE_DIMENSION.items()},
        window_length=window,
        mode='train',
        mean_std=mean_std)

    class _Args:
        task = constants.CLASSIFICATION
    ref_ds.args = _Args()
    ref_examples, trial, rlen, ridx = ref_ds[0]

    builder = ExampleBuilder(modality, window_length=window,
                             mean_std=mean_std)
    got = builder.build(item)

    for feat in ('vggish', 'bert'):
        ref_arr = ref_examples[feat].numpy()  # (1, T, D) via ToTensor
        np.testing.assert_allclose(got[feat], ref_arr[0], rtol=1e-6,
                                   atol=1e-6)
    ref_lab = ref_examples[constants.EXPR]  # (T, 1) float32
    np.testing.assert_array_equal(got[constants.EXPR],
                                  ref_lab[:, 0].astype(np.int32))
    # returned index contract (base/dataset.py:555-557)
    if length < window:
        np.testing.assert_array_equal(ridx, np.arange(window))
