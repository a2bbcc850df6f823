"""Shared torch-state-dict -> flax conversion conventions.

One implementation of the BN/conv layout translation used by every
native weight port in this package (retinaface.py, fan.py): torch
``OIHW`` conv kernels become flax ``HWIO`` via the (2, 3, 1, 0)
transpose, and a torch BatchNorm splits into flax's params
(scale/bias) + batch_stats (mean/var) collections.  Keeping these in
one place stops the two ports' conventions from drifting (e.g. a dtype
or eps fix landing in only one of them).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def torch_bn(sd: dict, prefix: str) -> Tuple[Dict, Dict]:
    """-> ({'scale', 'bias'}, {'mean', 'var'}) fp32."""
    return ({'scale': np.asarray(sd[f'{prefix}.weight'], np.float32),
             'bias': np.asarray(sd[f'{prefix}.bias'], np.float32)},
            {'mean': np.asarray(sd[f'{prefix}.running_mean'], np.float32),
             'var': np.asarray(sd[f'{prefix}.running_var'], np.float32)})


def torch_conv(sd: dict, prefix: str, bias: bool = False) -> Dict:
    """torch OIHW conv -> flax {'kernel': HWIO[, 'bias']} fp32."""
    out = {'kernel': np.asarray(sd[f'{prefix}.weight'],
                                np.float32).transpose(2, 3, 1, 0)}
    if bias:
        out['bias'] = np.asarray(sd[f'{prefix}.bias'], np.float32)
    return out
