"""Distribution Focal Loss (DFL) decode + target construction.

Reference semantics:
  * decode — running_main_v3.py:274-276: softmax over ``reg_max`` bins, then
    expectation against ``arange(reg_max)``.
  * targets — running_main_v3.py:357-360: two-bin linear interpolation
    (floor bin ``tl`` with weight ``wl``, ceil bin ``tr`` with weight ``wr``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dfl_decode(dist_logits: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, reg_max) logits -> (..., 4) expected ltrb distances."""
    reg_max = dist_logits.shape[-1]
    probs = jax.nn.softmax(dist_logits.astype(jnp.float32), axis=-1)
    project = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("...k,k->...", probs, project)


def dfl_targets(
    gt_ltrb: jnp.ndarray, reg_max: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft two-bin targets for DFL cross-entropy.

    gt_ltrb: (..., 4) distances already clipped to [0, reg_max - 1.01].
    Returns (tl, tr, wl, wr): int bins and float weights, each (..., 4).
    """
    tl = jnp.clip(jnp.floor(gt_ltrb), 0, reg_max - 1).astype(jnp.int32)
    tr = jnp.clip(tl + 1, 0, reg_max - 1)
    wl = tr.astype(jnp.float32) - gt_ltrb
    wr = gt_ltrb - tl.astype(jnp.float32)
    return tl, tr, wl, wr
