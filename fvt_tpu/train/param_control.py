"""Staged parameter freezing / gradual release.

Functional re-design of /root/reference/base/parameter_control.py:22-109
(ResnetParamControl: unfreeze backbone layer ranges in stages, rebuilding
the optimizer each release).  Here freezing is an optax mask: frozen
leaves get zero updates; ``release()`` moves to the next stage and returns
a freshly-wrapped optimizer (state rebuild, as the reference does).
"""
from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence

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
    """Gradual release with the reference ResnetParamControl's semantics
    (parameter_control.py:22-109): ``base_patterns`` (the head) train
    from the start; NO staged group is unlocked until the first
    ``release()``; each release pops the FIRST remaining group; once the
    stack or ``release_count`` is exhausted a further release sets
    ``early_stop`` (the reference halts training) instead of silently
    truncating."""

    def __init__(self, stage_patterns: List[List[str]],
                 release_count: int = 3,
                 base_patterns: Optional[List[str]] = None):
        self.stage_patterns = stage_patterns
        self.base_patterns = list(base_patterns or [])
        self.release_count = release_count
        self.released = 0
        self.early_stop = False

    def current_patterns(self) -> List[str]:
        out: List[str] = list(self.base_patterns)
        for group in self.stage_patterns[:self.released]:
            out.extend(group)
        return out

    def can_release(self) -> bool:
        return (not self.early_stop and self.release_count > 0
                and self.released < len(self.stage_patterns))

    def release(self, optimizer: optax.GradientTransformation, params
                ) -> optax.GradientTransformation:
        if not self.can_release():
            # "Early stopped since no further parameters to release!"
            self.early_stop = True
            return freeze(optimizer, params, self.current_patterns())
        self.released += 1
        self.release_count -= 1
        return freeze(optimizer, params, self.current_patterns())
