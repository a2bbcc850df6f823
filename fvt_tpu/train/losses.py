"""Loss functions: frame CE (classification) + CCC (regression).

CCC loss is the jax port of /root/reference/base/loss_function.py:6-23
(per-sequence Lin's concordance, unbiased variances, 1 - CCC averaged);
it backs the REGRESSION task path the reference's legacy trainer used for
valence/arousal.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def ccc(gold: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Per-sequence CCC over axis 1; gold/pred (B, T)."""
    gold_mean = jnp.mean(gold, axis=1, keepdims=True)
    pred_mean = jnp.mean(pred, axis=1, keepdims=True)
    covariance = (gold - gold_mean) * (pred - pred_mean)
    gold_var = jnp.var(gold, axis=1, keepdims=True, ddof=1)
    pred_var = jnp.var(pred, axis=1, keepdims=True, ddof=1)
    return 2.0 * covariance / (
        gold_var + pred_var + jnp.square(gold_mean - pred_mean) + 1e-50)


def ccc_loss(gold: jnp.ndarray, pred: jnp.ndarray,
             weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mean(1 - CCC) with optional per-element weights (reference
    semantics: the elementwise pre-mean product)."""
    loss = 1.0 - ccc(gold, pred)
    if weights is not None:
        loss = loss * weights
    return jnp.mean(loss)


def ccc_score(gold, pred) -> float:
    """Scalar Lin's CCC over flattened arrays (eval metric).

    Matches the reference's ContinuousMetricsCalculator semantics
    (/root/reference/base/logger.py:214-246): UNBIASED variances
    ("consistent with Matlab's nanvar", ddof=1) with a ddof=0 mean
    covariance and the 1e-100 epsilon — NOT the ddof=1-everywhere CCC
    the training loss uses (base/loss_function.py)."""
    import numpy as np
    g = np.asarray(gold, dtype=np.float64).ravel()
    p = np.asarray(pred, dtype=np.float64).ravel()
    gm, pm = g.mean(), p.mean()
    gv = ((g - gm) ** 2).sum() / (len(g) - 1)
    pv = ((p - pm) ** 2).sum() / (len(p) - 1)
    cov = ((g - gm) * (p - pm)).mean()
    return float(2 * cov / (gv + pv + (gm - pm) ** 2 + 1e-100))
