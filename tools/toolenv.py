"""Shared subprocess-environment helper for the CLI tools.

ONE copy of the repo's hardest-won environment gotcha: on this image
``PYTHONPATH=/root/.axon_site`` registers the axon TPU PJRT plugin, and
whenever that plugin is importable ``JAX_PLATFORMS=cpu`` is IGNORED —
the only reliable way to pin a SUBPROCESS to the CPU backend is to
exclude such site dirs from its PYTHONPATH (in-process,
``jax.config.update('jax_platforms', 'cpu')`` before first use works;
see tests/conftest.py and serve_http --force_cpu).
"""
from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_env(extra: dict = None) -> dict:
    """Copy of os.environ pinned to the CPU backend for a subprocess:
    repo first on PYTHONPATH, axon site dirs excluded, JAX_PLATFORMS
    set (harmless where no TPU plugin exists, decisive where the
    exclusion removed one)."""
    env = dict(os.environ)
    pp = [p for p in env.get('PYTHONPATH', '').split(':')
          if p and 'axon_site' not in p]
    env['PYTHONPATH'] = ':'.join([REPO] + pp)
    env['JAX_PLATFORMS'] = 'cpu'
    env.update(extra or {})
    return env
