"""TPU tunnel liveness probe (run BEFORE any TPU session — CLAUDE.md).

The axon tunnel can wedge so hard that even jax.devices() in a fresh
process blocks forever (observed 2026-08-17, 3+ h).  This probe runs a
tiny matmul and forces the result to host under a SIGALRM watchdog, so a
wedged tunnel reports in ~75 s instead of hanging the session.

Exit codes: 0 = tunnel ok, 3 = watchdog expired (tunnel wedged / absent).

Usage: python tools/probe_tpu.py [timeout_s]
"""
import os
import signal
import sys


def main():
    wd = int(sys.argv[1]) if len(sys.argv) > 1 else 75

    def timeout(signum, frame):
        print(f'TUNNEL PROBE TIMEOUT after {wd}s — do not start TPU '
              f'work this session (CPU-side tests/CLIs are unaffected)')
        os._exit(3)

    signal.signal(signal.SIGALRM, timeout)
    signal.alarm(wd)

    import jax
    import jax.numpy as jnp
    import numpy as np

    devs = jax.devices()
    x = jnp.ones((256, 256), jnp.bfloat16)
    val = float(np.asarray((x @ x)[0, 0]))  # forced to host: real round-trip
    signal.alarm(0)
    assert val == 256.0, val
    print(f'tunnel ok: {devs} matmul={val}')


if __name__ == '__main__':
    main()
