"""Bilinear / nearest resize matching PyTorch ``F.interpolate`` semantics.

The reference uses bilinear ``align_corners=False`` for BiFPN up/down paths
(main_model.py:211-239) and the 160->640 seg-logit upsample
(running_main_v3.py:252-255); mask metrics are sensitive to these semantics.

``jax.image.resize(method="bilinear", antialias=False)`` samples at half-pixel
centers with edge clamping — the same convention as PyTorch's
``align_corners=False`` (verified numerically in tests/test_resize.py against
torch CPU). Downsampling by 0.5 without antialias also matches PyTorch, which
never antialiases unless asked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC (or HWC) bilinear resize, half-pixel centers, no antialias.

    Stays on ``jax.image.resize`` even for the BiFPN 2x cases: a hand-rolled
    phase-lerp / 2x2-mean fast path was measured SLOWER end-to-end on TPU
    (427 -> 406 img/s; the stack/reshape relayouts cost more than XLA's
    gather lowering). tests/test_resize.py pins the exact-2x semantics."""
    shape = list(x.shape)
    shape[-3], shape[-2] = out_h, out_w
    return jax.image.resize(x, shape, method="bilinear", antialias=False).astype(
        x.dtype
    )


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC (or HWC) nearest resize (cv2.INTER_NEAREST-style)."""
    shape = list(x.shape)
    shape[-3], shape[-2] = out_h, out_w
    return jax.image.resize(x, shape, method="nearest").astype(x.dtype)
