"""Pure window-index math: train/eval windowing and overlap-stitching.

The reference computes windows with per-item Python loops
(/root/reference/base/dataset.py:434-453, trainer.py:894-912) and stitches
eval windows with a Counter-based scatter loop (trainer.py:832-892).  Here
both are expressed as precomputed index matrices + a single vectorised
scatter-add, which XLA maps onto the TPU without host round-trips.

Window rule (identical to both reference variants):
  * if length > window:  windows start at 0, hop, 2*hop, ... while a full
    window fits; if the last full window does not touch the final frame, an
    extra tail window [length-window, length) is appended.
  * else: a single window covering the whole sequence.
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp


def window_starts(length: int, window_length: int, hop_length: int) -> List[int]:
    """Start offsets of each window (reference windowing rule)."""
    if length <= window_length:
        return [0]
    steps = (length - window_length) // hop_length + 1
    starts = [i * hop_length for i in range(steps)]
    if starts[-1] + window_length - 1 < length - 1:
        starts.append(length - window_length)
    return starts


def windowing(x: np.ndarray, window_length: int, hop_length: int
              ) -> List[np.ndarray]:
    """Reference-identical list-of-index-arrays windowing.

    For ``len(x) <= window_length`` returns ``[x]`` (the short window is NOT
    padded here; padding semantics live in the dataset layer).
    """
    length = len(x)
    if length <= window_length:
        return [x]
    return [x[s:s + window_length]
            for s in window_starts(length, window_length, hop_length)]


def window_index_matrix(length: int, window_length: int, hop_length: int
                        ) -> np.ndarray:
    """(num_windows, window_length) int32 gather matrix.

    Only defined for ``length >= window_length`` (the stitched-eval path).
    """
    assert length >= window_length, (length, window_length)
    starts = np.asarray(
        window_starts(length, window_length, hop_length), dtype=np.int32)
    return starts[:, None] + np.arange(window_length, dtype=np.int32)[None, :]


def overlap_counts(length: int, window_length: int, hop_length: int
                   ) -> np.ndarray:
    """Per-frame window multiplicity, float32 (the Counter in trainer.py:879)."""
    idx = window_index_matrix(length, window_length, hop_length)
    counts = np.zeros((length,), dtype=np.float32)
    np.add.at(counts, idx.reshape(-1), 1.0)
    return counts


def stitch_windows(window_outputs: jnp.ndarray, index_matrix: jnp.ndarray,
                   length: int) -> jnp.ndarray:
    """Average per-window model outputs back onto the full timeline.

    Args:
      window_outputs: (num_windows, window_length, C) logits.
      index_matrix: (num_windows, window_length) int32 frame indices.
      length: total number of frames (static).

    Returns:
      (length, C) overlap-averaged logits — numerically identical to the
      reference scatter-then-divide (trainer.py:870-890).
    """
    num_windows, window_length, ncls = window_outputs.shape
    flat_idx = index_matrix.reshape(-1)
    flat_out = window_outputs.reshape(-1, ncls)
    summed = jnp.zeros((length, ncls), dtype=window_outputs.dtype
                       ).at[flat_idx].add(flat_out)
    counts = jnp.zeros((length,), dtype=window_outputs.dtype
                       ).at[flat_idx].add(1.0)
    return summed / counts[:, None]


def stitch_windows_np(window_outputs: np.ndarray,
                      index_matrix: np.ndarray, length: int) -> np.ndarray:
    """Numpy twin of :func:`stitch_windows` for the trainer's host-side
    stitch paths (the single scatter-average that reproduces the
    reference's Counter division, trainer.py:870-890) — ONE shared
    implementation so the pooled and per-video paths cannot drift."""
    n, w, ncls = window_outputs.shape
    flat = index_matrix.reshape(-1)
    summed = np.zeros((length, ncls), np.float32)
    counts = np.zeros((length,), np.float32)
    np.add.at(summed, flat, window_outputs.reshape(-1, ncls)
              .astype(np.float32))
    np.add.at(counts, flat, 1.0)
    return summed / counts[:, None]


def pad_index_matrix(index_matrix: np.ndarray, num_windows_padded: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Pad the window axis to a fixed bucket size for shape-stable jits.

    Padded windows all point at frame 0 but carry weight 0 so the stitch is
    unchanged.  Returns (padded_matrix, window_mask(float32)).
    """
    num_windows = index_matrix.shape[0]
    assert num_windows_padded >= num_windows
    pad = num_windows_padded - num_windows
    mat = np.concatenate(
        [index_matrix,
         np.zeros((pad, index_matrix.shape[1]), dtype=index_matrix.dtype)],
        axis=0)
    mask = np.concatenate(
        [np.ones((num_windows,), np.float32), np.zeros((pad,), np.float32)])
    return mat, mask


def stitch_windows_masked(window_outputs: jnp.ndarray,
                          index_matrix: jnp.ndarray,
                          window_mask: jnp.ndarray,
                          length: int) -> jnp.ndarray:
    """Like :func:`stitch_windows` but ignores masked (padded) windows."""
    num_windows, window_length, ncls = window_outputs.shape
    w = window_mask[:, None, None]
    flat_idx = index_matrix.reshape(-1)
    flat_out = (window_outputs * w).reshape(-1, ncls)
    flat_w = jnp.broadcast_to(w, (num_windows, window_length, 1)).reshape(-1)
    summed = jnp.zeros((length, ncls), dtype=window_outputs.dtype
                       ).at[flat_idx].add(flat_out)
    counts = jnp.zeros((length,), dtype=window_outputs.dtype
                       ).at[flat_idx].add(flat_w)
    counts = jnp.maximum(counts, 1e-12)
    return summed / counts[:, None]


def pad_short_window_indices(length: int, window_length: int) -> np.ndarray:
    """Frame-gather indices reproducing the reference pad-by-repeat rule.

    A trial shorter than the window is zero-padded then the tail is filled
    with copies of the LAST real frame (base/dataset.py:570-582) — labels
    included.  Expressed as a gather: [0, 1, ..., L-1, L-1, ..., L-1].
    """
    assert length < window_length, (length, window_length)
    idx = np.arange(window_length, dtype=np.int32)
    idx[length:] = length - 1
    return idx
