"""Batched instance-mask composition: NMS-selected coefficients x prototypes.

The reference carries this only in its stale standalone eval script
(/root/reference/src/test_model.py:81-85:
``masks = torch.einsum("bqc,bchw->bqhw", coeffs, protos).sigmoid()``) — the
training loop never supervises the coefficients. It is still part of the
capability surface (the BASELINE.json north-star names "the seg
mask-prototype matmul" as a batched on-device op), so this module provides
it TPU-native:

  * gather the per-anchor coefficients at the NMS keep indices (static
    [B, K, nm] shape; invalid slots use coeff 0 -> sigmoid 0.5, masked off
    by ``valid``),
  * one batched matmul [K, nm] @ [nm, Hp*Wp] per image (MXU; nm=32 rides a
    single 128-lane tile),
  * sigmoid, optional crop-to-box (ultralytics-style: zero outside the
    detection box, evaluated at prototype resolution), optional bilinear
    upsample to the network input size.

Everything is jit-compatible with static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .nms import NMSResult
from .resize import resize_bilinear


@partial(jax.jit, static_argnames=("crop", "img_size", "binarize"))
def compose_masks(
    coeffs: jnp.ndarray,  # [B, A, nm] mask coefficients (all anchors)
    protos: jnp.ndarray,  # [B, Hp, Wp, nm] prototype masks (NHWC)
    nms: NMSResult,  # boxes [B,K,4] xyxy in input-image pixels
    crop: bool = True,
    img_size: Optional[int] = None,
    binarize: bool = False,
) -> jnp.ndarray:
    """Per-instance sigmoid masks for the NMS survivors.

    Returns [B, K, Hp, Wp] float32 in [0, 1] (or bool if ``binarize``); if
    ``img_size`` is given the masks are bilinearly upsampled to
    [B, K, img_size, img_size] first. Slots with ``nms.valid == False`` are
    all-zero.
    """
    b, _, nm = coeffs.shape
    hp, wp = protos.shape[1], protos.shape[2]

    idx = jnp.maximum(nms.indices, 0)  # [B, K]; invalid -> anchor 0, masked below
    sel = jnp.take_along_axis(
        coeffs.astype(jnp.float32), idx[..., None], axis=1
    )  # [B, K, nm]
    sel = jnp.where(nms.valid[..., None], sel, 0.0)

    flat = protos.astype(jnp.float32).reshape(b, hp * wp, nm)
    logits = jnp.einsum(
        "bkc,bpc->bkp", sel, flat, preferred_element_type=jnp.float32
    ).reshape(b, -1, hp, wp)
    masks = jax.nn.sigmoid(logits)
    masks = jnp.where(nms.valid[..., None, None], masks, 0.0)

    if crop:
        # boxes live in input-image pixels; prototypes are at stride
        # img/Hp — scale boxes down to proto coordinates
        scale = (
            float(hp) / float(img_size)
            if img_size is not None
            else None
        )
        if scale is None:
            raise ValueError("crop=True requires img_size to scale boxes")
        bx = nms.boxes * scale  # [B, K, 4] xyxy at proto resolution
        ys = jnp.arange(hp, dtype=jnp.float32)[None, None, :, None] + 0.5
        xs = jnp.arange(wp, dtype=jnp.float32)[None, None, None, :] + 0.5
        inside = (
            (xs >= bx[..., 0, None, None])
            & (xs <= bx[..., 2, None, None])
            & (ys >= bx[..., 1, None, None])
            & (ys <= bx[..., 3, None, None])
        )
        masks = jnp.where(inside, masks, 0.0)

    if img_size is not None and (hp != img_size or wp != img_size):
        # resize expects NHWC: fold K into batch
        k = masks.shape[1]
        up = resize_bilinear(
            masks.reshape(b * k, hp, wp, 1), img_size, img_size
        )
        masks = up.reshape(b, k, img_size, img_size)

    if binarize:
        return masks > 0.5
    return masks
