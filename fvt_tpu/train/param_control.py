"""Staged parameter freezing / gradual release.

Functional re-design of /root/reference/base/parameter_control.py:22-109
(ResnetParamControl: unfreeze backbone layer ranges in stages, rebuilding
the optimizer each release).  Here freezing is an optax mask: frozen
leaves get zero updates; ``release()`` moves to the next stage and returns
a freshly-wrapped optimizer (state rebuild, as the reference does).
"""
from __future__ import annotations

import re
from typing import Callable, List, Sequence

import jax
import optax


def path_mask(params, patterns: Sequence[str]) -> dict:
    """Bool pytree: True (trainable) where the '/'-joined param path
    matches any regex in ``patterns``; empty patterns -> everything
    trainable."""
    if not patterns:
        return jax.tree.map(lambda _: True, params)
    regexes = [re.compile(p) for p in patterns]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def match(path) -> bool:
        name = '/'.join(str(getattr(k, 'key', k)) for k in path)
        return any(r.search(name) for r in regexes)

    masked = {jax.tree_util.keystr(path): match(path)
              for path, _ in flat}

    def lookup(path, _):
        return masked[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(lookup, params)


def freeze(optimizer: optax.GradientTransformation, params,
           trainable_patterns: Sequence[str]
           ) -> optax.GradientTransformation:
    """Optimizer that only updates leaves matching the patterns."""
    mask = path_mask(params, trainable_patterns)
    return optax.multi_transform(
        {'train': optimizer, 'freeze': optax.set_to_zero()},
        jax.tree.map(lambda m: 'train' if m else 'freeze', mask))


class ParamControl:
    """Gradual release: stage i unlocks the union of the first i+1 pattern
    groups.  ``release_count`` caps the number of releases
    (parameter_control.py:22-50)."""

    def __init__(self, stage_patterns: List[List[str]],
                 release_count: int = 3):
        self.stage_patterns = stage_patterns
        self.release_count = min(release_count, len(stage_patterns) - 1)
        self.stage = 0

    def current_patterns(self) -> List[str]:
        out: List[str] = []
        for group in self.stage_patterns[:self.stage + 1]:
            out.extend(group)
        return out

    def can_release(self) -> bool:
        return self.stage < self.release_count

    def release(self, optimizer: optax.GradientTransformation, params
                ) -> optax.GradientTransformation:
        assert self.can_release()
        self.stage += 1
        return freeze(optimizer, params, self.current_patterns())
