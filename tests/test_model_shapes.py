"""Shape tests for every Flax module + both full-model variants, at a reduced
image size (256) to keep CPU test time sane. Mirrors the reference's
__main__ smoke tests (main_model.py:607-716, main_modelv2.py:571-668)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multitask_bonetumor_yolo_tpu.models import (
    ConvBlock,
    DepthwiseConvBlock,
    Bottleneck,
    C2f,
    ConvNeXtFeatures,
    BiFPN,
    DetectHead,
    SegmentHead,
    Proto,
    MultitaskModel,
    ModelConfig,
)

KEY = jax.random.PRNGKey(0)


def init_apply(module, *args, train=True, **kwargs):
    vars_ = module.init(KEY, *args, train=train, **kwargs)
    out, _ = module.apply(vars_, *args, train=train, mutable=["batch_stats"], **kwargs)
    return out, vars_


def test_convblock():
    x = jnp.zeros((2, 16, 16, 8))
    out, _ = init_apply(ConvBlock(32, 3), x)
    assert out.shape == (2, 16, 16, 32)
    out, _ = init_apply(ConvBlock(32, 3, strides=2), x)
    assert out.shape == (2, 8, 8, 32)


def test_dwconvblock():
    x = jnp.zeros((2, 16, 16, 24))
    out, _ = init_apply(DepthwiseConvBlock(24), x)
    assert out.shape == (2, 16, 16, 24)


def test_bottleneck_residual():
    x = jnp.zeros((1, 8, 8, 16))
    out, _ = init_apply(Bottleneck(16, shortcut=True, e=1.0), x)
    assert out.shape == (1, 8, 8, 16)


def test_c2f():
    x = jnp.zeros((1, 8, 8, 192))
    out, _ = init_apply(C2f(256), x)
    assert out.shape == (1, 8, 8, 256)


def test_convnext_features():
    x = jnp.zeros((1, 128, 128, 3))
    m = ConvNeXtFeatures()
    vars_ = m.init(KEY, x)
    p3, p4, p5 = m.apply(vars_, x)
    assert p3.shape == (1, 16, 16, 192)
    assert p4.shape == (1, 8, 8, 384)
    assert p5.shape == (1, 4, 4, 768)


def test_convnext_param_count():
    # ConvNeXt-Tiny trunk ≈ 27.8M params (sanity vs timm convnext_tiny 28.6M
    # incl. classifier head which we don't have)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = ConvNeXtFeatures().init(KEY, x)
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(vars_["params"]))
    assert 26e6 < n < 29e6, n


def test_bifpn():
    feats = [
        jnp.zeros((1, 32, 32, 256)),
        jnp.zeros((1, 16, 16, 384)),
        jnp.zeros((1, 8, 8, 512)),
    ]
    out, vars_ = init_apply(BiFPN(feature_size=128, num_layers=2), feats)
    assert [o.shape for o in out] == [
        (1, 32, 32, 128),
        (1, 16, 16, 128),
        (1, 8, 8, 128),
    ]
    # fusion weights exist and are init to 1.0 (reference bug fixed)
    w1 = vars_["params"]["unit0"]["w1"]
    np.testing.assert_allclose(np.asarray(w1), np.ones((2, 2)))


def test_detect_head():
    feats = [
        jnp.zeros((2, 32, 32, 256)),
        jnp.zeros((2, 16, 16, 256)),
        jnp.zeros((2, 8, 8, 256)),
    ]
    out, _ = init_apply(DetectHead(nc=2), feats)
    assert [o.shape for o in out] == [
        (2, 32, 32, 66),
        (2, 16, 16, 66),
        (2, 8, 8, 66),
    ]


def test_proto():
    x = jnp.zeros((2, 32, 32, 256))
    out, _ = init_apply(Proto(npr=256, nm=32), x)
    assert out.shape == (2, 64, 64, 32)


def test_segment_head():
    feats = [
        jnp.zeros((2, 32, 32, 256)),
        jnp.zeros((2, 16, 16, 256)),
        jnp.zeros((2, 8, 8, 256)),
    ]
    (det_raw, coeffs, protos), _ = init_apply(SegmentHead(nc=2, nm=32), feats)
    A = 32 * 32 + 16 * 16 + 8 * 8
    assert [o.shape for o in det_raw] == [
        (2, 32, 32, 66),
        (2, 16, 16, 66),
        (2, 8, 8, 66),
    ]
    assert coeffs.shape == (2, A, 32)
    assert protos.shape == (2, 64, 64, 32)


@pytest.mark.parametrize("single_head", [False, True])
def test_full_model_train_and_infer(single_head):
    cfg = ModelConfig(nc_det=2, nc_img=2, img_size=128, single_head=single_head)
    model = MultitaskModel(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = model.init(KEY, x, train=True, mode="train")

    out, _ = model.apply(vars_, x, train=True, mode="train", mutable=["batch_stats"])
    A = 16 * 16 + 8 * 8 + 4 * 4
    assert [f.shape for f in out["det_feats"]] == [
        (1, 16, 16, 66),
        (1, 8, 8, 66),
        (1, 4, 4, 66),
    ]
    assert out["seg_coeffs"].shape == (1, A, 32)
    assert out["protos"].shape == (1, 32, 32, 32)
    assert out["seg_logits"].shape == (1, 128, 128, 1)
    assert out["cls_logits"].shape == (1, 2)

    out, _ = model.apply(vars_, x, train=False, mode="infer", mutable=["batch_stats"])
    assert out["det_preds"].shape == (1, A, 6)
    assert out["seg_preds"].shape == (1, A, 6 + 32)
    assert out["cls_probs"].shape == (1, 2)
    assert out["seg_prob"].shape == (1, 128, 128, 1)
    probs = np.asarray(out["cls_probs"])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_model_rejects_unknown_mode():
    cfg = ModelConfig(img_size=64)
    model = MultitaskModel(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(KEY, x, train=True, mode="train")
    with pytest.raises(ValueError):
        model.apply(vars_, x, train=False, mode="eval", mutable=["batch_stats"])


def test_fused_tower_first_conv_exact(monkeypatch):
    """The concatenated first-layer tower conv (fused_first_conv) must
    reproduce the unfused per-branch path exactly, in train AND eval modes,
    for both heads (v1 dual-head exercises DetectHead + SegmentHead)."""
    cfg = ModelConfig(
        nc_det=2, nc_img=2, img_size=128, single_head=False,
        backbone_depths=(1, 1, 1, 1), backbone_dims=(16, 24, 32, 48),
        bifpn_num_layers=1,
    )
    model = MultitaskModel(cfg)
    x = jnp.asarray(
        np.random.RandomState(7).rand(2, 128, 128, 3), jnp.float32
    )
    vars_ = model.init(KEY, x, train=True, mode="train")

    def run(train, mode):
        out, ups = model.apply(
            vars_, x, train=train, mode=mode, mutable=["batch_stats"]
        )
        return out, ups["batch_stats"]

    outs = {}
    for fuse in ("1", "0"):
        monkeypatch.setenv("MTBY_FUSE_TOWERS", fuse)
        outs[fuse] = (run(True, "train"), run(False, "infer"))
    for (o_f, st_f), (o_u, st_u) in zip(outs["1"], outs["0"]):
        for k in ("det_feats", "seg_coeffs", "protos", "cls_logits"):
            np.testing.assert_allclose(
                np.asarray(jnp.concatenate([jnp.ravel(v) for v in jax.tree.leaves(o_f[k])])),
                np.asarray(jnp.concatenate([jnp.ravel(v) for v in jax.tree.leaves(o_u[k])])),
                rtol=1e-5, atol=1e-5, err_msg=k,
            )
        for a, b in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_u)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )
