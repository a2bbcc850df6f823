"""CCC loss parity vs the reference torch implementation."""
import numpy as np
import jax.numpy as jnp

from conftest import add_reference_to_path
from fvt_tpu.train.losses import ccc_loss, ccc_score


def test_ccc_loss_parity():
    add_reference_to_path()
    import torch
    from base.loss_function import CCCLoss

    rng = np.random.default_rng(0)
    gold = rng.normal(size=(4, 50)).astype(np.float32)
    pred = (gold * 0.8 + rng.normal(size=(4, 50)) * 0.3).astype(np.float32)

    want = CCCLoss()(torch.from_numpy(gold), torch.from_numpy(pred)).item()
    got = float(ccc_loss(jnp.asarray(gold), jnp.asarray(pred)))
    assert abs(got - want) < 1e-5

    w = rng.uniform(size=(4, 1)).astype(np.float32)
    want = CCCLoss()(torch.from_numpy(gold), torch.from_numpy(pred),
                     torch.from_numpy(w)).item()
    got = float(ccc_loss(jnp.asarray(gold), jnp.asarray(pred),
                         jnp.asarray(w)))
    assert abs(got - want) < 1e-5


def test_ccc_score_properties():
    x = np.random.default_rng(1).normal(size=(100,))
    # reference semantics (base/logger.py:232-246): ddof=0 covariance
    # over Matlab-nanvar ddof=1 variances -> identity scores (n-1)/n
    assert abs(ccc_score(x, x) - 99 / 100) < 1e-9
    assert ccc_score(x, -x) < 0.0  # anti-correlation is NEGATIVE
