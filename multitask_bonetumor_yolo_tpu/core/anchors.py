"""Anchor-free grid generation for the 3 FPN levels (strides 8/16/32).

Reference semantics: running_main_v3.py:277-284 builds, per level,
anchor points at (x + 0.5, y + 0.5) in *grid units* (multiplied by the
stride only at decode time).  We precompute the concatenated grid once per
image size — shapes are static under jit.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

DEFAULT_STRIDES: Tuple[int, ...] = (8, 16, 32)


def level_shapes(img_size: int, strides: Sequence[int] = DEFAULT_STRIDES):
    """[(H_l, W_l)] for each FPN level of a square ``img_size`` input."""
    return [(img_size // s, img_size // s) for s in strides]


def make_anchors(
    img_size: int,
    strides: Sequence[int] = DEFAULT_STRIDES,
    offset: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenated anchor points over all levels.

    Returns:
      points:  (A, 2) float32 — (x, y) in grid units, offset by ``offset``.
               Row-major per level, levels concatenated stride-ascending
               (same order the reference concatenates per-level decode lists).
      stride:  (A, 1) float32 — stride of each anchor.
    """
    pts, strs = [], []
    for s in strides:
        n = img_size // s
        # numpy here: this runs once at trace time, result is a constant.
        ys, xs = np.meshgrid(
            np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32),
            indexing="ij",
        )
        pts.append(
            np.stack([xs + offset, ys + offset], axis=-1).reshape(-1, 2)
        )
        strs.append(np.full((n * n, 1), float(s), dtype=np.float32))
    return jnp.asarray(np.concatenate(pts, 0)), jnp.asarray(np.concatenate(strs, 0))


def num_anchors(img_size: int, strides: Sequence[int] = DEFAULT_STRIDES) -> int:
    return sum((img_size // s) ** 2 for s in strides)
