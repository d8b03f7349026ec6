"""ops.resize parity with torch F.interpolate(align_corners=False) — the
semantics the reference relies on for BiFPN paths and the seg-logit upsample."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multitask_bonetumor_yolo_tpu.ops.resize import resize_bilinear, resize_nearest


def _torch_bilinear(x_nhwc, out_h, out_w):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    y = F.interpolate(t, size=(out_h, out_w), mode="bilinear", align_corners=False)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def test_bilinear_upsample_x2_matches_torch(rng):
    x = rng.randn(2, 20, 20, 8).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 40, 40))
    want = _torch_bilinear(x, 40, 40)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_downsample_x05_matches_torch(rng):
    x = rng.randn(2, 40, 40, 8).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 20, 20))
    want = _torch_bilinear(x, 20, 20)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_160_to_640_matches_torch(rng):
    # the seg-logit resize (running_main_v3.py:252-255)
    x = rng.randn(1, 160, 160, 1).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 640, 640))
    want = _torch_bilinear(x, 640, 640)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_shape(rng):
    x = rng.randn(1, 10, 10, 3).astype(np.float32)
    assert resize_nearest(jnp.asarray(x), 30, 30).shape == (1, 30, 30, 3)


def test_up2x_fast_path_matches_jax_image(rng):
    import jax
    x = jnp.asarray(rng.rand(2, 7, 9, 3).astype(np.float32))
    got = resize_bilinear(x, 14, 18)
    want = jax.image.resize(x, (2, 14, 18, 3), "bilinear", antialias=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_down2x_fast_path_matches_jax_image(rng):
    import jax
    x = jnp.asarray(rng.rand(2, 8, 12, 3).astype(np.float32))
    got = resize_bilinear(x, 4, 6)
    want = jax.image.resize(x, (2, 4, 6, 3), "bilinear", antialias=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
