"""Deterministic randomness policy.

The reference mutates global RNGs everywhere (reproducibility.py:89-143,
per-epoch ``seed = default + counter`` trainer.py:293-297, 100x deterministic
train shuffles base/experiment.py:186-189).  Here randomness is explicit:

* one root ``jax.random.key`` per experiment derived from the config seed;
* named ``fold_key`` derivations for independent streams (epoch, dropout,
  data order) so adding a consumer never perturbs the others;
* numpy Generators (never the global ``np.random``) for host-side
  shuffling/subsampling, seeded from the same root.
"""
from __future__ import annotations

import zlib

import jax
import numpy as np

# modulus for the 32-bit seed domain: 2**32, NOT 2**32 - 1 (a Mersenne
# modulus makes seed 2**32-1 collide with seed 0, and the epoch
# countdown default+counter wrap one step early at the boundary)
MAX_SEED = 2 ** 32


def _stable_hash(name: str) -> int:
    """Process-independent string hash (Python's hash() is salted)."""
    return zlib.crc32(name.encode('utf-8'))


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed % MAX_SEED)


def fold_key(key: jax.Array, name: str, index: int = 0) -> jax.Array:
    """Derive a named, indexed subkey (stable under consumer reordering)."""
    data = jax.random.fold_in(key, _stable_hash(name) % MAX_SEED)
    return jax.random.fold_in(data, index % MAX_SEED)


def epoch_seed(default_seed: int, counter: int) -> int:
    """The observable per-epoch derived seed (trainer.py:293-297)."""
    return int((default_seed + counter) % MAX_SEED)


def np_rng(seed: int, name: str = '', index: int = 0) -> np.random.Generator:
    ss = np.random.SeedSequence([seed % MAX_SEED,
                                 _stable_hash(name) % MAX_SEED,
                                 index % MAX_SEED])
    return np.random.default_rng(ss)


def stable_shuffle(items: list, seed: int, rounds: int = 100) -> list:
    """Deterministic multi-round shuffle of the train window list.

    Keeps the reference's observable contract (same list in, same order out
    for a given seed; base/experiment.py:186-189) without mutating any
    global RNG state.
    """
    out = list(items)
    rng = np_rng(seed, 'stable_shuffle')
    for _ in range(rounds):
        rng.shuffle(out)
    return out
