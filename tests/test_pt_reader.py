"""Torch-free .pt reader: real torch.save bytes parsed with stdlib only,
verified value-exact against torch.load (the in-image torch is the oracle;
the production path never imports it)."""

import numpy as np
import pytest
import torch

from multitask_bonetumor_yolo_tpu.utils.import_torch_weights import (
    load_safetensors,
    load_torch_state_dict,
)
from multitask_bonetumor_yolo_tpu.utils.pt_reader import (
    load_pt,
    load_state_dict,
)


def test_dtypes_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    sd = {
        "f32": torch.from_numpy(rng.randn(3, 4).astype(np.float32)),
        "f64": torch.from_numpy(rng.randn(2, 2)),
        "f16": torch.from_numpy(rng.randn(5).astype(np.float16)),
        "i64": torch.arange(6, dtype=torch.int64).reshape(2, 3),
        "i32": torch.arange(4, dtype=torch.int32),
        "u8": torch.from_numpy(rng.randint(0, 255, (3, 3)).astype(np.uint8)),
        "bool": torch.tensor([True, False, True]),
        "bf16": torch.from_numpy(rng.randn(4, 4).astype(np.float32)).bfloat16(),
        "scalar": torch.tensor(3.5),
    }
    p = tmp_path / "sd.pt"
    torch.save(sd, p)
    out = load_pt(p)
    assert set(out) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(
            np.asarray(out[k], np.float64), v.double().numpy(), err_msg=k
        )


def test_noncontiguous_and_shared_storage(tmp_path):
    """Views (transpose, slices) share one storage; strides must be honored."""
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    sd = {"t": base.t(), "s": base[1:3, ::2], "full": base}
    p = tmp_path / "views.pt"
    torch.save(sd, p)
    out = load_pt(p)
    np.testing.assert_array_equal(out["t"], base.t().numpy())
    np.testing.assert_array_equal(out["s"], base[1:3, ::2].numpy())
    np.testing.assert_array_equal(out["full"], base.numpy())


def test_nested_wrappers(tmp_path):
    """{'state_dict': ...} and {'epoch':..,'model':{...}} unwrap like the
    reference's checkpoint handling."""
    w = torch.randn(2, 3)
    p = tmp_path / "wrapped.pt"
    torch.save({"state_dict": {"layer.weight": w}, "epoch": 7}, p)
    sd = load_state_dict(p)
    np.testing.assert_array_equal(sd["layer.weight"], w.numpy())


def test_pickled_module_object(tmp_path):
    """A whole nn.Module pickled (ultralytics style: torch.save({'model':
    model})) parses without torch: unknown classes become opaque and the
    tensor leaves surface with module-internal path parts stripped."""
    m = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, bias=True), torch.nn.BatchNorm2d(8)
    )
    p = tmp_path / "module.pt"
    torch.save({"model": m, "names": {0: "a"}}, p)
    sd = load_state_dict(p)
    np.testing.assert_array_equal(
        sd["0.weight"], m[0].weight.detach().numpy()
    )
    np.testing.assert_array_equal(
        sd["1.running_mean"], m[1].running_mean.numpy()
    )


def test_load_torch_state_dict_is_torch_free(tmp_path, monkeypatch):
    """The production entry point must not import torch even for .pt."""
    import builtins

    real_import = builtins.__import__

    def guard(name, *a, **k):
        if name == "torch" or name.startswith("torch."):
            raise AssertionError("production path imported torch")
        return real_import(name, *a, **k)

    w = torch.randn(4, 4)
    p = tmp_path / "x.pt"
    torch.save({"w": w}, p)
    monkeypatch.setattr(builtins, "__import__", guard)
    sd = load_torch_state_dict(str(p))
    np.testing.assert_array_equal(sd["w"], w.numpy())


def test_safetensors_reader(tmp_path):
    """Dependency-free .safetensors parse (header+buffer format)."""
    import json

    rng = np.random.RandomState(1)
    a = rng.randn(3, 5).astype(np.float32)
    b = np.arange(4, dtype=np.int64)
    abytes, bbytes = a.tobytes(), b.tobytes()
    header = {
        "a": {"dtype": "F32", "shape": [3, 5],
              "data_offsets": [0, len(abytes)]},
        "b": {"dtype": "I64", "shape": [4],
              "data_offsets": [len(abytes), len(abytes) + len(bbytes)]},
    }
    hjson = json.dumps(header).encode()
    p = tmp_path / "w.safetensors"
    with open(p, "wb") as f:
        f.write(np.uint64(len(hjson)).tobytes())
        f.write(hjson)
        f.write(abytes + bbytes)
    out = load_safetensors(str(p))
    np.testing.assert_array_equal(out["a"], a)
    np.testing.assert_array_equal(out["b"], b)


def test_legacy_format_clear_error(tmp_path):
    """Pre-zip torch files fail with an actionable message, not a zip
    traceback."""
    p = tmp_path / "legacy.pt"
    p.write_bytes(b"\x80\x02}q\x00.")
    with pytest.raises((ValueError, Exception)) as ei:
        load_pt(p)
    assert "zip" in str(ei.value).lower() or "File is not a zip" in str(ei.value)
