"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware.  Must be set before jax is imported.
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402  (before any other module pulls in jax)

# the session may be launched with JAX_PLATFORMS=axon baked in; the config
# knob wins over the env var regardless of import order
jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache: repeated suite runs skip the expensive
# ResNet-50 grad compiles (minutes -> seconds)
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '.jax_cache')
jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = '/root/reference'


def add_reference_to_path():
    """Make the torch reference importable for golden-parity tests.

    Stubs the handful of third-party modules the reference imports at
    module scope but that are not in this image (display-only deps).
    """
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import types

    if 'torchvision' not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            import numpy as _np
            import torch as _torch

            tv = types.ModuleType('torchvision')
            tf = types.ModuleType('torchvision.transforms')

            class Compose:
                def __init__(self, ts):
                    self.ts = ts

                def __call__(self, x):
                    for t in self.ts:
                        x = t(x)
                    return x

            class ToTensor:
                def __call__(self, pic):
                    t = _torch.from_numpy(_np.ascontiguousarray(pic))
                    if pic.ndim == 2:
                        t = t.unsqueeze(0)
                    elif pic.ndim == 3:
                        t = t.permute(2, 0, 1).contiguous()
                    if pic.dtype == _np.uint8:
                        t = t.float().div(255)
                    return t

            class Normalize:
                def __init__(self, mean, std):
                    self.mean = _torch.as_tensor(_np.asarray(mean),
                                                 dtype=_torch.float32)
                    self.std = _torch.as_tensor(_np.asarray(std),
                                                dtype=_torch.float32)

                def __call__(self, t):
                    return (t - self.mean) / self.std

            class _T:
                pass

            _T.Compose = Compose
            _T.ToTensor = ToTensor
            _T.Normalize = Normalize
            tf.transforms = _T
            tf.Compose = Compose
            tf.ToTensor = ToTensor
            tf.Normalize = Normalize
            tv.transforms = tf
            sys.modules['torchvision'] = tv
            sys.modules['torchvision.transforms'] = tf

    if 'munch' not in sys.modules:
        try:
            import munch  # noqa: F401
        except ImportError:
            mod = types.ModuleType('munch')

            class Munch(dict):
                def __getattr__(self, k):
                    try:
                        return self[k]
                    except KeyError:
                        raise AttributeError(k)

                def __setattr__(self, k, v):
                    self[k] = v

            mod.Munch = Munch
            sys.modules['munch'] = mod

    if 'pynvml' not in sys.modules:
        try:
            import pynvml  # noqa: F401
        except ImportError:
            mod = types.ModuleType('pynvml')
            smi = types.ModuleType('pynvml.smi')

            class nvidia_smi:
                @staticmethod
                def getInstance():
                    class _I:
                        def DeviceQuery(self, *a, **k):
                            return {}
                    return _I()

            smi.nvidia_smi = nvidia_smi
            mod.smi = smi
            sys.modules['pynvml'] = mod
            sys.modules['pynvml.smi'] = smi

    if 'texttable' not in sys.modules:
        try:
            import texttable  # noqa: F401
        except ImportError:
            mod = types.ModuleType('texttable')

            class Texttable:
                HEADER = 1

                def __init__(self, *a, **k):
                    pass

                def __getattr__(self, name):
                    return lambda *a, **k: self

                def draw(self):
                    return ''

            mod.Texttable = Texttable
            sys.modules['texttable'] = mod
