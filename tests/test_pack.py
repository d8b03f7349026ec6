"""BatchPacker round-trip: one packed transfer must reproduce every leaf
bit-exactly (dtype, shape, values), single-device and sharded."""

import numpy as np
import pytest

from multitask_bonetumor_yolo_tpu.parallel import BatchPacker, create_mesh


def _batch(b=8):
    rng = np.random.default_rng(0)
    return {
        "image": rng.integers(0, 255, (b, 32, 32, 3)).astype(np.uint8),
        "mask": rng.integers(0, 2, (b, 32, 32, 1)).astype(np.uint8),
        "boxes": rng.normal(size=(b, 4, 5)).astype(np.float32),
        "box_valid": rng.integers(0, 2, (b, 4)).astype(bool),
        "img_cls": rng.integers(0, 3, (b,)).astype(np.int32),
        "f16": rng.normal(size=(b, 7)).astype(np.float16),
    }


def _check(out, batch):
    assert set(out) == set(batch)
    for k, v in batch.items():
        got = np.asarray(out[k])
        assert got.dtype == v.dtype, k
        assert got.shape == v.shape, k
        np.testing.assert_array_equal(got, v, err_msg=k)


def test_pack_roundtrip_single_device():
    batch = _batch()
    _check(BatchPacker()(batch), batch)


def test_pack_roundtrip_sharded():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = create_mesh()
    batch = _batch(b=8 * (mesh.shape["data"] // min(mesh.shape["data"], 8)))
    out = BatchPacker(mesh)(batch)
    _check(out, batch)
    # leaves come out sharded over the data axis
    assert "data" in str(out["image"].sharding.spec)


def test_pack_canonicalizes_64bit():
    batch = {"x": np.arange(8, dtype=np.float64), "i": np.arange(8)}
    out = BatchPacker()(batch)
    assert np.asarray(out["x"]).dtype == np.float32
    assert np.asarray(out["i"]).dtype == np.int32


def test_pack_rejects_indivisible_batch():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = create_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        BatchPacker(mesh)({"x": np.zeros((mesh.shape["data"] + 1, 2))})
