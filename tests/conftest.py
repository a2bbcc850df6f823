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
