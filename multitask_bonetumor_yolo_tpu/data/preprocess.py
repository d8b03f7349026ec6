"""On-device (XLA) preprocessing + augmentation stage.

BASELINE.json names "fused preprocessing pipeline: letterbox + mosaic + HSV
augment feeding batched train step" as a benchmark config. Host code only
decodes JPEGs and letterboxes to the static canvas (data/dataset.py); every
per-pixel op below runs batched on device inside the jitted train step:

  * ``normalize``      uint8 -> float [0,1]  (dataset_btxrdv2.py:159 /255.0)
  * ``hsv_augment``    YOLO-style random hue/sat/val jitter (capability
                       upgrade — the reference has NO augmentation)
  * ``random_hflip``   image + box flip
  * ``mosaic4``        4-way mosaic: quadrant-downscale compose + box remap

All ops are static-shape and differentiable-free (applied to inputs only).
Augmentations default OFF for reference parity (AugmentConfig()).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear, resize_nearest


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    hsv_h: float = 0.0  # YOLO default 0.015 when enabled
    hsv_s: float = 0.0  # 0.7
    hsv_v: float = 0.0  # 0.4
    hflip_prob: float = 0.0  # 0.5
    mosaic_prob: float = 0.0  # 1.0

    @property
    def enabled(self) -> bool:
        return (
            self.hsv_h > 0 or self.hsv_s > 0 or self.hsv_v > 0
            or self.hflip_prob > 0 or self.mosaic_prob > 0
        )


def normalize(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> float32 [0,1]."""
    return images_u8.astype(jnp.float32) / 255.0


# ---------------------------------------------------------------- HSV jitter
def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, ((g - b) / safe_d) % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0),
    ) / 6.0
    h = jnp.where(d == 0, 0.0, h)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_augment(
    images: jnp.ndarray, key: jax.Array, gains: Tuple[float, float, float]
) -> jnp.ndarray:
    """Per-image random hue shift + sat/val scaling. images: f32 [B,H,W,3]."""
    b = images.shape[0]
    r = jax.random.uniform(key, (b, 3), minval=-1.0, maxval=1.0)
    gh = r[:, 0] * gains[0]
    gs = r[:, 1] * gains[1] + 1.0
    gv = r[:, 2] * gains[2] + 1.0
    hsv = _rgb_to_hsv(images)
    h = (hsv[..., 0] + gh[:, None, None]) % 1.0
    s = jnp.clip(hsv[..., 1] * gs[:, None, None], 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * gv[:, None, None], 0.0, 1.0)
    return _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


# ---------------------------------------------------------------- flips
def random_hflip(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    masks: jnp.ndarray,
    key: jax.Array,
    prob: float,
):
    """Per-image horizontal flip. boxes: [B,M,5] (cls,xc,yc,w,h) normalised."""
    b = images.shape[0]
    flip = jax.random.bernoulli(key, prob, (b,))
    imgs_f = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    masks_f = jnp.where(flip[:, None, None, None], masks[:, :, ::-1, :], masks)
    xc = jnp.where(flip[:, None], 1.0 - boxes[..., 1], boxes[..., 1])
    boxes_f = boxes.at[..., 1].set(xc)
    return imgs_f, boxes_f, masks_f


# ---------------------------------------------------------------- mosaic
def mosaic4(
    images: jnp.ndarray,  # [B,S,S,3] f32, B % 4 == 0
    boxes: jnp.ndarray,  # [B,M,5]
    valid: jnp.ndarray,  # [B,M]
    masks: jnp.ndarray,  # [B,S,S,1]
):
    """Compose groups of 4 into quadrant mosaics; output batch is B//4.

    Each source is downscaled 2x into a quadrant; normalised box coords map
    as (x, y) -> (x + ox) / 2 where (ox, oy) ∈ {0,1}². Output keeps M box
    slots: valid boxes are packed to the front across the 4 sources.
    """
    b, s = images.shape[0], images.shape[1]
    assert b % 4 == 0, "mosaic4 needs a multiple-of-4 batch"
    g = b // 4
    m = boxes.shape[1]

    small = resize_bilinear(images, s // 2, s // 2).reshape(g, 4, s // 2, s // 2, 3)
    small_m = resize_nearest(masks, s // 2, s // 2).reshape(g, 4, s // 2, s // 2, 1)
    top = jnp.concatenate([small[:, 0], small[:, 1]], axis=2)
    bot = jnp.concatenate([small[:, 2], small[:, 3]], axis=2)
    out_img = jnp.concatenate([top, bot], axis=1)
    top_m = jnp.concatenate([small_m[:, 0], small_m[:, 1]], axis=2)
    bot_m = jnp.concatenate([small_m[:, 2], small_m[:, 3]], axis=2)
    out_mask = (jnp.concatenate([top_m, bot_m], axis=1) > 0.5).astype(masks.dtype)

    bx = boxes.reshape(g, 4, m, 5)
    vd = valid.reshape(g, 4, m)
    ox = jnp.asarray([0.0, 1.0, 0.0, 1.0])[None, :, None]
    oy = jnp.asarray([0.0, 0.0, 1.0, 1.0])[None, :, None]
    new = jnp.stack(
        [
            bx[..., 0],
            (bx[..., 1] + ox) * 0.5,
            (bx[..., 2] + oy) * 0.5,
            bx[..., 3] * 0.5,
            bx[..., 4] * 0.5,
        ],
        axis=-1,
    ).reshape(g, 4 * m, 5)
    vflat = vd.reshape(g, 4 * m)

    # pack valid boxes first, keep M slots (stable order)
    order = jnp.argsort(~vflat, axis=1, stable=True)
    packed = jnp.take_along_axis(new, order[..., None], axis=1)[:, :m]
    packed_valid = jnp.take_along_axis(vflat, order, axis=1)[:, :m]
    packed = jnp.where(packed_valid[..., None], packed, 0.0)
    return out_img, packed, packed_valid, out_mask


def augment_batch(
    batch: Dict[str, jnp.ndarray], key: jax.Array, cfg: AugmentConfig
) -> Dict[str, jnp.ndarray]:
    """Full on-device stage: normalise (+ optional mosaic/HSV/flip).

    With mosaic enabled the output batch size is B//4 — callers account for
    that in their step shapes. img_cls under mosaic takes source 0's label.
    """
    images = normalize(batch["image"])
    boxes, valid, masks = batch["boxes"], batch["box_valid"], batch["mask"]
    img_cls = batch["img_cls"]

    if not cfg.enabled:
        out = dict(batch)
        out["image"] = images
        return out

    k_mosaic, k_hsv, k_flip, k_gate = jax.random.split(key, 4)
    if cfg.mosaic_prob > 0:
        m_img, m_boxes, m_valid, m_mask = mosaic4(images, boxes, valid, masks)
        use = jax.random.bernoulli(k_gate, cfg.mosaic_prob, (m_img.shape[0],))
        g = m_img.shape[0]
        images = jnp.where(use[:, None, None, None], m_img, images[:g])
        boxes = jnp.where(use[:, None, None], m_boxes, boxes[:g])
        valid = jnp.where(use[:, None], m_valid, valid[:g])
        masks = jnp.where(use[:, None, None, None], m_mask, masks[:g])
        img_cls = img_cls[:g]

    if cfg.hsv_h > 0 or cfg.hsv_s > 0 or cfg.hsv_v > 0:
        images = hsv_augment(images, k_hsv, (cfg.hsv_h, cfg.hsv_s, cfg.hsv_v))
    if cfg.hflip_prob > 0:
        images, boxes, masks = random_hflip(images, boxes, masks, k_flip, cfg.hflip_prob)

    out = dict(
        image=images,
        boxes=boxes,
        box_valid=valid,
        mask=masks,
        img_cls=img_cls,
        id=batch["id"][: images.shape[0]],
    )
    if "sample_valid" in batch:
        out["sample_valid"] = batch["sample_valid"][: images.shape[0]]
    return out
