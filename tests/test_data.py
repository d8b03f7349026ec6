"""Data layer: converter round-trip, dataset contract, stratified split,
loader batching, on-device augments."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multitask_bonetumor_yolo_tpu.data import (
    BTXRD,
    BTXRDLoader,
    DataConfig,
    make_synthetic_btxrd,
    make_synthetic_raw,
)
from multitask_bonetumor_yolo_tpu.data.convert import convert
from multitask_bonetumor_yolo_tpu.data.preprocess import (
    AugmentConfig,
    augment_batch,
    hsv_augment,
    mosaic4,
    normalize,
    _rgb_to_hsv,
    _hsv_to_rgb,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    return make_synthetic_btxrd(str(tmp_path_factory.mktemp("btxrd")), n=24, seed=1)


def test_dataset_item_contract(synth_root):
    cfg = DataConfig(root=str(synth_root), img_size=320, max_boxes=8)
    ds = BTXRD(cfg, split="train")
    assert len(ds) > 0
    it = ds[0]
    assert it["image"].shape == (320, 320, 3) and it["image"].dtype == np.uint8
    assert it["boxes"].shape == (8, 5)
    assert it["box_valid"].shape == (8,)
    assert it["mask"].shape == (320, 320, 1)
    assert set(np.unique(it["mask"])) <= {0.0, 1.0}
    assert it["box_valid"].sum() >= 1
    # boxes normalised
    v = it["boxes"][it["box_valid"]]
    assert (v[:, 1:] >= 0).all() and (v[:, 1:] <= 1).all()


def test_dataset_mask_aligns_with_boxes(synth_root):
    # synthetic boxes == bright rects == mask rects; after letterbox the
    # mask fraction inside GT boxes should be ~1
    cfg = DataConfig(root=str(synth_root), img_size=320, max_boxes=8)
    ds = BTXRD(cfg, split="train")
    it = ds[0]
    S = 320
    m = it["mask"][..., 0]
    for row in it["boxes"][it["box_valid"]]:
        _, xc, yc, w, h = row
        x1, y1 = int((xc - w / 2) * S), int((yc - h / 2) * S)
        x2, y2 = int(np.ceil((xc + w / 2) * S)), int(np.ceil((yc + h / 2) * S))
        inside = m[y1 + 1 : y2 - 1, x1 + 1 : x2 - 1]
        assert inside.size == 0 or inside.mean() > 0.95


def test_stratified_split(synth_root):
    cfg = DataConfig(root=str(synth_root))
    tr, va = BTXRD(cfg, "train"), BTXRD(cfg, "val")
    assert len(tr) + len(va) == 24
    th, vh = tr.class_histogram(), va.class_histogram()
    for c in set(th) | set(vh):
        n_tr, n_va = th.get(c, 0), vh.get(c, 0)
        ratio = n_tr / (n_tr + n_va)
        assert abs(ratio - cfg.train_ratio) < 0.1  # 24 items: coarse check
    # deterministic given the seed
    tr2 = BTXRD(cfg, "train")
    assert [it["id"] for it in tr.items] == [it["id"] for it in tr2.items]
    # no leakage
    assert not ({it["id"] for it in tr.items} & {it["id"] for it in va.items})


def test_split_all_returns_everything(synth_root):
    cfg = DataConfig(root=str(synth_root))
    assert len(BTXRD(cfg, "all")) == 24
    assert len(BTXRD(cfg, "test")) == 24


def test_loader_shapes_and_drop_last(synth_root):
    cfg = DataConfig(root=str(synth_root), img_size=320, max_boxes=8, batch_size=5)
    ds = BTXRD(cfg, "all")
    loader = BTXRDLoader(ds, shuffle=True, drop_last=True, seed=3)
    batches = list(loader)
    assert len(batches) == 24 // 5 == len(loader)
    b = batches[0]
    assert b["image"].shape == (5, 320, 320, 3)
    assert b["boxes"].shape == (5, 8, 5)
    assert b["mask"].shape == (5, 320, 320, 1)
    assert b["img_cls"].shape == (5,)
    loader2 = BTXRDLoader(ds, shuffle=False, drop_last=False)
    assert len(list(loader2)) == (24 + cfg.batch_size - 1) // cfg.batch_size


def test_converter_roundtrip(tmp_path):
    raw = make_synthetic_raw(str(tmp_path / "raw"), n=6, seed=2)
    n = convert(str(raw), str(raw / "dataset.csv"), str(tmp_path / "ready"))
    assert n == 6
    cfg = DataConfig(root=str(tmp_path / "ready"), img_size=256, max_boxes=4)
    ds = BTXRD(cfg, "all")
    assert len(ds) == 6
    it = ds[0]
    assert it["box_valid"].sum() == 1  # one rectangle per synthetic annotation
    assert it["mask"].max() == 1.0  # polygon rasterised AND survives binarise
    # classes alternate benign(0)/malignant(1)
    classes = sorted({int(d["img_cls"]) for d in (ds[i] for i in range(6))})
    assert classes == [0, 1]


# ---------------------------------------------------------------- device ops
def test_converter_xlsx_meta(tmp_path):
    """--meta dataset.xlsx works without openpyxl via the vendored reader
    (reference contract: label_parsing.py:99-104)."""
    import csv

    from multitask_bonetumor_yolo_tpu.utils.xlsx import (
        read_xlsx_dicts,
        write_xlsx,
    )

    raw = make_synthetic_raw(str(tmp_path / "raw"), n=6, seed=2)
    with open(raw / "dataset.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    # mix types the way a real sheet does: ints for flags, strings for ids
    write_xlsx(
        raw / "dataset.xlsx",
        ["image_id", "tumor", "benign"],
        [[r["image_id"], int(r["tumor"]), int(r["benign"])] for r in rows],
    )
    parsed = read_xlsx_dicts(raw / "dataset.xlsx")
    assert [p["image_id"] for p in parsed] == [r["image_id"] for r in rows]
    assert all(p["tumor"] == int(r["tumor"]) for p, r in zip(parsed, rows))

    n = convert(str(raw), str(raw / "dataset.xlsx"), str(tmp_path / "ready"))
    assert n == 6
    ds = BTXRD(DataConfig(root=str(tmp_path / "ready"), img_size=256), "all")
    classes = sorted({int(ds[i]["img_cls"]) for i in range(6)})
    assert classes == [0, 1]


def test_xlsx_shared_strings_and_gaps(tmp_path):
    """Reader handles sharedStrings cells and sparse rows (column gaps)."""
    import zipfile

    from multitask_bonetumor_yolo_tpu.utils.xlsx import (
        read_xlsx_rows,
        write_xlsx,
    )

    p = tmp_path / "t.xlsx"
    write_xlsx(p, ["a", "b", "c"], [["x", 1, 2.5]])
    # rewrite sheet1 to use shared strings + a skipped column
    with zipfile.ZipFile(p) as zf:
        names = {n: zf.read(n) for n in zf.namelist()}
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    names["xl/sharedStrings.xml"] = (
        f'<sst xmlns="{ns}" count="2" uniqueCount="2">'
        "<si><t>hello</t></si><si><r><t>wor</t></r><r><t>ld</t></r></si></sst>"
    ).encode()
    names["xl/worksheets/sheet1.xml"] = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c>'
        '<c r="D1" t="b"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    with zipfile.ZipFile(p, "w") as zf:
        for n, data in names.items():
            zf.writestr(n, data)
    rows = read_xlsx_rows(p)
    assert rows == [["hello", None, "world", True]]


def test_normalize():
    u8 = jnp.asarray(np.array([[[[0, 128, 255]]]], np.uint8))
    out = np.asarray(normalize(u8))
    np.testing.assert_allclose(out, [[[[0.0, 128 / 255, 1.0]]]], atol=1e-6)


def test_hsv_roundtrip(rng):
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    back = _hsv_to_rgb(_rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_hsv_augment_zero_gain_identity(rng):
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    out = hsv_augment(x, jax.random.PRNGKey(0), (0.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_mosaic4_boxes(rng):
    S, M = 64, 4
    images = jnp.asarray(rng.rand(4, S, S, 3).astype(np.float32))
    masks = jnp.zeros((4, S, S, 1))
    boxes = np.zeros((4, M, 5), np.float32)
    valid = np.zeros((4, M), bool)
    for i in range(4):
        boxes[i, 0] = [i % 2, 0.5, 0.5, 0.4, 0.4]
        valid[i, 0] = True
    img, b, v, m = mosaic4(images, jnp.asarray(boxes), jnp.asarray(valid), masks)
    assert img.shape == (1, S, S, 3)
    assert int(v.sum()) == 4
    got = np.asarray(b[0][:4])
    # quadrant centers: (0.25,0.25),(0.75,0.25),(0.25,0.75),(0.75,0.75)
    np.testing.assert_allclose(got[:, 1:3],
        [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]], atol=1e-6)
    np.testing.assert_allclose(got[:, 3:], 0.2, atol=1e-6)


def test_augment_batch_parity_mode(synth_root):
    cfg = DataConfig(root=str(synth_root), img_size=320, max_boxes=8, batch_size=4)
    loader = BTXRDLoader(BTXRD(cfg, "all"))
    batch = next(iter(loader))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    out = augment_batch(jbatch, jax.random.PRNGKey(0), AugmentConfig())
    assert out["image"].dtype == jnp.float32
    assert float(out["image"].max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(out["boxes"]), batch["boxes"])


def test_augment_batch_full_pipeline(synth_root):
    cfg = DataConfig(root=str(synth_root), img_size=320, max_boxes=8, batch_size=8)
    loader = BTXRDLoader(BTXRD(cfg, "all"))
    batch = next(iter(loader))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    acfg = AugmentConfig(hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, hflip_prob=0.5,
                         mosaic_prob=1.0)
    out = jax.jit(lambda b, k: augment_batch(b, k, acfg))(
        jbatch, jax.random.PRNGKey(1)
    )
    assert out["image"].shape == (2, 320, 320, 3)  # 8 -> 2 mosaics
    assert out["boxes"].shape == (2, 8, 5)
    assert bool(out["box_valid"].any())
    v = np.asarray(out["boxes"])[np.asarray(out["box_valid"])]
    assert (v[:, 1:] >= 0).all() and (v[:, 1:] <= 1).all()


def test_converter_seg_polygons(tmp_path):
    raw = make_synthetic_raw(str(tmp_path / "raw2"), n=3, seed=5)
    convert(str(raw), str(raw / "dataset.csv"), str(tmp_path / "ready2"),
            emit_seg_polygons=True)
    seg = sorted((tmp_path / "ready2" / "labels_seg").glob("*.txt"))
    assert len(seg) == 3
    line = seg[0].read_text().splitlines()[0].split()
    # class id + 4 polygon points (x, y) normalised
    assert len(line) == 1 + 8
    assert all(0.0 <= float(v) <= 1.0 for v in line[1:])


def test_prefetcher_basic_and_map_fn():
    from multitask_bonetumor_yolo_tpu.data.dataset import Prefetcher

    items = list(range(7))
    assert list(Prefetcher(iter(items))) == items
    # map_fn runs in the worker thread and transforms each item
    assert list(Prefetcher(iter(items), map_fn=lambda x: x * 10)) == [
        x * 10 for x in items
    ]


def test_prefetcher_propagates_worker_error():
    from multitask_bonetumor_yolo_tpu.data.dataset import Prefetcher

    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(Prefetcher(gen()))
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetcher_map_fn_error_propagates():
    from multitask_bonetumor_yolo_tpu.data.dataset import Prefetcher

    def bad(x):
        raise ValueError("mapfail")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mapfail"):
        list(Prefetcher(iter([1]), map_fn=bad))
