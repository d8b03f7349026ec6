"""Offline converter: labelme annotations + metadata -> training-ready dir.

Parity target: /root/reference/src/pipeline/label_parsing.py (CLI at :96-143).
  input   SRC/Annotations/*.json (labelme), SRC/images/*.jpeg, metadata table
          with columns (image_id, tumor, benign)
  output  DST/images/*.jpeg (hardlinks), DST/labels_det/*.txt (YOLO rows),
          DST/masks/*.png, DST/img_cls.csv (filename,class_id)

Class taxonomy (label_parsing.py:26-28, "Yao 2025"): benign -> "B-tumor"(0),
tumor-not-benign -> "M-tumor"(1), else "normal" (skipped: CLS2ID has no
normal entry — process_one raises KeyError in the reference; we skip with a
warning, which is the intended behaviour for a det/seg training set).

Deliberate fix (SURVEY.md §2.4): the reference writes mask pixels as value
127 (label_parsing.py:52,:64) which its own loader then binarises to
all-zero. We write 255 so any sane threshold works; our loader binarises >0.

Metadata: .xlsx is read with the vendored stdlib reader (utils/xlsx.py — no
openpyxl/pandas needed, matching the reference's ``--meta dataset.xlsx``
contract); a .csv/.tsv with the same columns is also accepted.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Dict, List

import numpy as np

CLS2ID = {"B-tumor": 0, "M-tumor": 1}
BOX2ID = {"B-tumor": 0, "M-tumor": 1}
MASK_FOREGROUND = 255


def polygon_to_mask(points, h: int, w: int) -> np.ndarray:
    """Rasterise one polygon to a binary uint8 mask (cv2 fast path with a
    pure-numpy scanline fallback so the converter runs anywhere)."""
    try:
        import cv2

        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [np.asarray(points, np.int32)], 1)
        return mask
    except ImportError:  # pragma: no cover
        return _fill_polygon_np(points, h, w)


def _fill_polygon_np(points, h: int, w: int) -> np.ndarray:  # pragma: no cover
    """Even-odd scanline polygon fill in numpy."""
    pts = np.asarray(points, np.float64)
    mask = np.zeros((h, w), np.uint8)
    ys = np.arange(h) + 0.5
    x0, y0 = pts[:, 0], pts[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    for i, y in enumerate(ys):
        cond = (y0 <= y) != (y1 <= y)
        if not cond.any():
            continue
        xs = x0[cond] + (y - y0[cond]) * (x1[cond] - x0[cond]) / (y1[cond] - y0[cond])
        xs = np.sort(xs)
        for a, b in zip(xs[::2], xs[1::2]):
            lo, hi = int(np.ceil(a - 0.5)), int(np.floor(b - 0.5))
            if hi >= lo:
                mask[i, max(lo, 0) : min(hi + 1, w)] = 1
    return mask


def build_type_map(meta_path: str) -> Dict[str, str]:
    """(image_id, tumor, benign) table -> {stem: B-tumor|M-tumor|normal}
    (reference label_parsing.py:77-83)."""
    p = Path(meta_path)
    if p.suffix.lower() in (".csv", ".tsv"):
        import csv as _csv

        mapping = {}
        with open(p, newline="") as f:
            reader = _csv.DictReader(f, delimiter="\t" if p.suffix == ".tsv" else ",")
            for row in reader:
                stem = Path(str(row["image_id"])).stem
                tumor = str(row["tumor"]).strip() in ("1", "True", "true")
                benign = str(row["benign"]).strip() in ("1", "True", "true")
                mapping[stem] = "B-tumor" if benign else ("M-tumor" if tumor else "normal")
        return mapping
    # .xlsx path — vendored stdlib reader (utils/xlsx.py), no excel engine
    # needed; matches the reference contract label_parsing.py:99-104.
    from ..utils.xlsx import read_xlsx_dicts

    def truthy(v) -> bool:
        if isinstance(v, str):
            return v.strip().lower() in ("1", "true", "yes")
        return bool(v)

    return {
        Path(str(row["image_id"])).stem: (
            "B-tumor" if truthy(row["benign"])
            else ("M-tumor" if truthy(row["tumor"]) else "normal")
        )
        for row in read_xlsx_dicts(p)
    }


def process_one(
    json_path: Path,
    out_det: Path,
    out_mask: Path,
    global_cls: str,
    out_seg: Path | None = None,
) -> int:
    """One labelme file -> det txt + mask png (+ optional YOLO-seg polygon
    txt). Returns the image class id.
    (reference label_parsing.py:39-66; every shape takes the image-level
    class, polygons rasterise into one union mask, rectangles become YOLO
    rows; the -v1 parser variant additionally emits YOLO-seg polygon rows,
    label_parsing-v1.py:46-57 — enabled here via ``out_seg``)."""
    js = json.loads(json_path.read_text())
    h, w = js["imageHeight"], js["imageWidth"]
    full_mask = np.zeros((h, w), np.uint8)
    det_lines: List[str] = []
    seg_lines: List[str] = []

    for sh in js.get("shapes", []):
        lbl = global_cls
        if sh["shape_type"] == "polygon" and lbl in CLS2ID:
            full_mask = np.maximum(full_mask, polygon_to_mask(sh["points"], h, w))
            if out_seg is not None:
                coords = " ".join(
                    f"{x / w:.6f} {y / h:.6f}" for x, y in sh["points"]
                )
                seg_lines.append(f"{CLS2ID[lbl]} {coords}")
        elif sh["shape_type"] == "rectangle" and lbl in BOX2ID:
            (x1, y1), (x2, y2) = sh["points"]
            xc, yc = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
            bw, bh = abs(x2 - x1) / w, abs(y2 - y1) / h
            det_lines.append(f"{BOX2ID[lbl]} {xc:.6f} {yc:.6f} {bw:.6f} {bh:.6f}")

    (out_det / f"{json_path.stem}.txt").write_text("\n".join(det_lines))
    if out_seg is not None:
        (out_seg / f"{json_path.stem}.txt").write_text("\n".join(seg_lines))
    _write_png(out_mask / f"{json_path.stem}.png", full_mask * MASK_FOREGROUND)
    return CLS2ID[global_cls]


def _write_png(path: Path, arr: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(str(path), arr)
    except ImportError:  # pragma: no cover
        from PIL import Image

        Image.fromarray(arr).save(path)


def convert(
    src: str, meta: str, dst: str, img_ext: str = ".jpeg",
    emit_seg_polygons: bool = False,
) -> int:
    """Returns the number of converted annotations."""
    src_p, dst_p = Path(src), Path(dst)
    dirs = ["labels_det", "masks", "images"]
    if emit_seg_polygons:
        dirs.append("labels_seg")
    for d in dirs:
        (dst_p / d).mkdir(parents=True, exist_ok=True)

    type_map = build_type_map(meta)
    rows: List[List] = []
    json_files = sorted((src_p / "Annotations").glob("*.json"))
    skipped = 0
    for js in json_files:
        cls_name = type_map.get(js.stem, "normal")
        if cls_name not in CLS2ID:
            skipped += 1
            continue
        class_id = process_one(
            js, dst_p / "labels_det", dst_p / "masks", cls_name,
            out_seg=(dst_p / "labels_seg") if emit_seg_polygons else None,
        )
        img_src = src_p / "images" / f"{js.stem}{img_ext}"
        img_dst = dst_p / "images" / img_src.name
        if img_src.exists() and not img_dst.exists():
            try:
                os.link(img_src, img_dst)
            except OSError:
                import shutil

                shutil.copy2(img_src, img_dst)
        rows.append([img_dst.name, class_id])

    with open(dst_p / "img_cls.csv", "w", newline="") as f:
        for r in rows:
            f.write(f"{r[0]},{r[1]}\n")
    if skipped:
        print(f"[convert] Skipped {skipped} 'normal' (tumor-free) annotations.")
    print(f"[convert] Converted {len(rows)}/{len(json_files)} annotations -> {dst}")
    return len(rows)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="BTXRD folder (with Annotations/, images/)")
    ap.add_argument("--meta", required=True, help="dataset metadata (.csv or .xlsx)")
    ap.add_argument("--dst", default="btxrd_ready", help="output dir")
    ap.add_argument("--img-ext", default=".jpeg", help="image extension")
    ap.add_argument(
        "--emit-seg-polygons", action="store_true",
        help="also write YOLO-seg polygon txt rows (label_parsing-v1 variant)",
    )
    args = ap.parse_args(argv)
    convert(args.src, args.meta, args.dst, args.img_ext, args.emit_seg_polygons)


if __name__ == "__main__":
    main()
