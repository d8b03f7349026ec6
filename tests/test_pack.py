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


def test_pack_bitpacks_binary_masks():
    """'mask' leaves ship 8 pixels/byte: the packed buffer must shrink by
    ~7/8 of the mask bytes and still round-trip bit-exactly."""
    from multitask_bonetumor_yolo_tpu.parallel.pack import (
        _pack_host, _spec_of,
    )

    batch = _batch()
    plain = _pack_host(batch, 1, _spec_of(batch, (), 1))
    packed = _pack_host(batch, 1, _spec_of(batch, ("mask",), 1))
    saved = batch["mask"].size * 7 // 8
    assert plain.shape[1] - packed.shape[1] == saved
    _check(BatchPacker(bitpack_keys=("mask",))(batch), batch)
    # bool masks round-trip too
    batch["mask"] = batch["mask"].astype(bool)
    _check(BatchPacker()(batch), batch)


def test_pack_bitpack_skips_non8_multiple():
    batch = {"mask": np.ones((1, 3, 1, 1), np.uint8)}  # 3 elems: not /8
    _check(BatchPacker()(batch), batch)


def test_pack_multistream_roundtrip():
    batch = _batch()
    _check(BatchPacker(streams=4)(batch), batch)


# ------------------------------------------------------------- OutputPacker
def test_output_packer_roundtrip():
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.parallel.pack import OutputPacker

    p = OutputPacker()
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) * 1.5,
        "b": jnp.asarray([True, False, True]),
        "c": jnp.arange(4, dtype=jnp.int32) - 2,
        "d": jnp.asarray(3.25, jnp.float32),  # scalar
        "e": jnp.asarray([[1.5, -2.5]], jnp.bfloat16),  # stored as f32
    }
    buf, spec = p.pack(tree)
    host = np.asarray(buf)
    assert host.dtype == np.uint8 and OutputPacker.nbytes(spec) == host.size
    out = OutputPacker.unpack(host, spec)
    np.testing.assert_allclose(out["a"], np.asarray(tree["a"]))
    assert out["b"].dtype == bool
    np.testing.assert_array_equal(out["b"], np.asarray(tree["b"]))
    np.testing.assert_array_equal(out["c"], np.asarray(tree["c"]))
    assert float(out["d"]) == 3.25
    np.testing.assert_allclose(out["e"], [[1.5, -2.5]])
    # jit cache reuse: same spec -> same compiled fn
    buf2, spec2 = p.pack(tree)
    assert spec2 == spec and len(p._fns) == 1


def test_output_packer_concat_epoch():
    """Per-step buffers concatenated then split per spec (the drain path)."""
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.parallel.pack import OutputPacker

    p = OutputPacker()
    steps = [
        {"x": jnp.full((3,), float(i), jnp.float32),
         "n": jnp.asarray(i, jnp.int32)}
        for i in range(4)
    ]
    packed = [p.pack(s) for s in steps]
    joined = np.asarray(jnp.concatenate([b for b, _ in packed]))
    off = 0
    for i, (_, spec) in enumerate(packed):
        n = OutputPacker.nbytes(spec)
        d = OutputPacker.unpack(joined[off : off + n], spec)
        off += n
        np.testing.assert_allclose(d["x"], np.full((3,), float(i)))
        assert int(d["n"]) == i
    assert off == joined.size


# --------------------------------------------------------- DeviceEvalCache
def _cache_batches(n_batches=3, b=4):
    rng = np.random.default_rng(7)
    out = []
    for i in range(n_batches):
        out.append({
            "image": rng.integers(0, 255, (b, 16, 16, 3)).astype(np.uint8),
            "boxes": rng.normal(size=(b, 4, 5)).astype(np.float32),
            "box_valid": rng.integers(0, 2, (b, 4)).astype(bool),
            "img_cls": rng.integers(0, 3, (b,)).astype(np.int32),
            "mask": rng.integers(0, 2, (b, 16, 16, 1)).astype(np.uint8),
        })
    return out


def test_device_eval_cache_replays_identically():
    from multitask_bonetumor_yolo_tpu.data.dataset import DeviceEvalCache

    batches = _cache_batches()
    calls = {"n": 0}

    def make_loader():
        calls["n"] += 1
        return iter([dict(b) for b in batches])

    cache = DeviceEvalCache(make_loader, BatchPacker())
    first = [(dict(h), jb) for h, jb in cache]
    second = list(cache)
    assert calls["n"] == 1  # replay did not re-open the loader
    assert len(first) == len(second) == len(batches)
    for (h1, j1), (h2, j2), orig in zip(first, second, batches):
        for k in ("image", "boxes"):
            np.testing.assert_array_equal(np.asarray(j2[k]), orig[k])
        # replay host dict keeps the metric fields
        np.testing.assert_array_equal(h2["img_cls"], orig["img_cls"])
        np.testing.assert_array_equal(h2["boxes"], orig["boxes"])
    # batch 0 retains the FULL host dict for viz overlays
    assert "image" in second[0][0] and "mask" in second[0][0]
    assert "image" not in second[1][0]


def test_device_eval_cache_prime_overlaps_first_epoch():
    """prime() populates the cache on a background thread (the Trainer
    calls it at the start of epoch 0 so the val upload overlaps train
    compute, VERDICT r4 #5); a later iteration joins the primer and
    replays from the cache without re-opening the loader."""
    from multitask_bonetumor_yolo_tpu.data.dataset import DeviceEvalCache

    batches = _cache_batches()
    calls = {"n": 0}

    def make_loader():
        calls["n"] += 1
        return iter([dict(b) for b in batches])

    cache = DeviceEvalCache(make_loader, BatchPacker())
    cache.prime()
    cache.prime()  # idempotent
    out = list(cache)
    assert calls["n"] == 1  # the primer's pass was the only loader open
    assert len(out) == len(batches)
    for (h, jb), orig in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(jb["image"]), orig["image"])
    assert list(cache)  # further replays still work


def test_device_eval_cache_tail_streams_past_budget():
    from multitask_bonetumor_yolo_tpu.data.dataset import DeviceEvalCache

    batches = _cache_batches(4)
    one = sum(v.nbytes for v in batches[0].values())

    def make_loader():
        return iter([dict(b) for b in batches])

    cache = DeviceEvalCache(make_loader, BatchPacker(), max_bytes=2 * one)
    _ = list(cache)
    assert len(cache._cached) == 2 and cache._tail
    replay = list(cache)
    assert len(replay) == 4
    for (h, jb), orig in zip(replay, batches):
        np.testing.assert_array_equal(np.asarray(jb["image"]), orig["image"])
