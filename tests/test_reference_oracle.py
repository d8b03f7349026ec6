"""End-to-end numerical oracle vs a literal torch transcription (VERDICT r3 #4).

Previous parity evidence was piecewise (ConvNeXt conversion vs torch, loss vs
a numpy transcription, heads by golden values). This file converts that into
parity-by-measurement for the WHOLE pipeline: a literal torch port of the
reference's ``ConvNeXtBiFPNYOLO.forward`` (/root/reference/src/main_model.py
:300-393, with the timm trunk and ultralytics head modules expanded to plain
``torch.nn.functional`` calls) plus its ``_multitask_loss``
(/root/reference/src/running_main_v3.py:232-387) is driven with the SAME
weights as the Flax model — read straight out of the Flax param tree with
layout transposes only — and every intermediate head output and every loss
component must agree to fp32 tolerance.

BN-mode semantics replicated exactly: the reference validates with the body
in eval() but the detect/segment heads force-toggled to train()
(main_model.py:356-362), so the flax side runs ``train=False, mode="train"``
and the torch side uses running stats for body BN and batch stats for head BN.

This also end-to-end-validates the TPU-native fast paths against straight
torch math: the Proto phase fusion (heads.py), the DepthwiseConvBlock 1x1
fold (common.py), and the PatchifyConv stem (backbone.py) all execute on the
flax side here.

Scaled-down architecture (small trunk dims, bifpn_feature_size 64, img 160)
— the COMPOSITION is what's under test; per-module full-size numerics are
covered by tests/test_weight_import.py and the golden-value tests.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multitask_bonetumor_yolo_tpu.losses import LossConfig
from multitask_bonetumor_yolo_tpu.losses.multitask import multitask_loss
from multitask_bonetumor_yolo_tpu.models import ModelConfig, MultitaskModel

IMG = 160
B = 2
M = 4  # padded GT boxes
CFG = ModelConfig(
    nc_det=2, nc_img=2, proto_ch=8, bifpn_feature_size=64,
    bifpn_num_layers=2, img_size=IMG, single_head=False, dtype="float32",
    pallas="off", backbone_depths=(1, 1, 2, 1), backbone_dims=(16, 32, 48, 64),
)
BN_EPS_BODY = 4e-5
BN_EPS_HEAD = 1e-3


# ---------------------------------------------------------------- helpers
def T(a):
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


def cw(k):
    """flax conv kernel [kh,kw,I,O] -> torch [O,I,kh,kw]."""
    return T(k).permute(3, 2, 0, 1).contiguous()


def _bn(x, p, s, training, eps):
    rm, rv = T(s["mean"]).clone(), T(s["var"]).clone()
    return F.batch_norm(x, rm, rv, T(p["scale"]), T(p["bias"]),
                        training=training, momentum=0.1, eps=eps)


def conv_block(x, p, s, k, training, *, stride=1, act="silu", eps=BN_EPS_BODY,
               groups=1):
    """reference ConvBlock (main_model.py:113-141) / ultralytics Conv."""
    p, s = p["ConvBN_0"], s["ConvBN_0"]
    w = cw(p["Conv_0"]["kernel"])
    b = T(p["Conv_0"]["bias"]) if "bias" in p["Conv_0"] else None
    x = F.conv2d(x, w, b, stride=stride, padding=k // 2, groups=groups)
    x = _bn(x, p["BatchNorm_0"], s["BatchNorm_0"], training, eps)
    return F.silu(x) if act == "silu" else F.elu(x)


def dw_conv_block(x, p, s, training):
    """reference DepthwiseConvBlock k=1 (main_model.py:62-102)."""
    x = F.conv2d(x, cw(p["Conv_0"]["kernel"]), None, groups=x.shape[1])
    x = F.conv2d(x, cw(p["Conv_1"]["kernel"]), None)
    x = _bn(x, p["BatchNorm_0"], s["BatchNorm_0"], training, BN_EPS_BODY)
    return F.elu(x)


def bottleneck(x, p, s, training):
    """reference Bottleneck e=1.0, shortcut=False (main_model.py:42-59)."""
    y = conv_block(x, p["ConvBlock_0"], s["ConvBlock_0"], 3, training)
    return conv_block(y, p["ConvBlock_1"], s["ConvBlock_1"], 3, training)


def c2f(x, p, s, cout, training, n=2):
    """reference C2f (main_model.py:144-173)."""
    c = cout // 2
    y = conv_block(x, p["ConvBlock_0"], s["ConvBlock_0"], 1, training)
    parts = [y[:, :c], y[:, c:]]
    for i in range(n):
        parts.append(
            bottleneck(parts[-1], p[f"Bottleneck_{i}"], s[f"Bottleneck_{i}"],
                       training)
        )
    return conv_block(torch.cat(parts, 1), p["ConvBlock_1"], s["ConvBlock_1"],
                      1, training)


def layer_norm_nchw(x, p, eps=1e-6):
    xl = x.permute(0, 2, 3, 1)
    xl = F.layer_norm(xl, xl.shape[-1:], T(p["LayerNorm_0"]["scale"]),
                      T(p["LayerNorm_0"]["bias"]), eps=eps)
    return xl.permute(0, 3, 1, 2)


def trunk_forward(x, p, depths, out_indices=(1, 2, 3)):
    """timm convnext features_only trunk (reference main_model.py:12-38)."""
    outs = []
    for i, d in enumerate(depths):
        if i == 0:
            x = F.conv2d(x, cw(p["stem_conv"]["kernel"]),
                         T(p["stem_conv"]["bias"]), stride=4)
            x = layer_norm_nchw(x, p["stem_norm"])
        else:
            x = layer_norm_nchw(x, p[f"downsample_norm{i}"])
            x = F.conv2d(x, cw(p[f"downsample_conv{i}"]["kernel"]),
                         T(p[f"downsample_conv{i}"]["bias"]), stride=2)
        for j in range(d):
            bp = p[f"stage{i}_block{j}"]
            res = x
            dim = x.shape[1]
            x = F.conv2d(x, cw(bp["dw_kernel"]), T(bp["dw_bias"]),
                         padding=3, groups=dim)
            xl = x.permute(0, 2, 3, 1)
            xl = F.layer_norm(xl, xl.shape[-1:], T(bp["ln_scale"]),
                              T(bp["ln_bias"]), eps=1e-6)
            xl = F.linear(xl, T(bp["w1"]).t(), T(bp["b1"]))
            xl = F.gelu(xl)
            xl = F.linear(xl, T(bp["w2"]).t(), T(bp["b2"]))
            xl = xl * T(bp["gamma"])
            x = res + xl.permute(0, 3, 1, 2)
        if i in out_indices:
            outs.append(x)
    return outs


def bifpn_unit(feats, p, s, training):
    """reference BiFPNUnit (main_model.py:176-243)."""
    p3_x, p4_x, p5_x = feats
    eps = 1e-4

    def norm(w):
        w = F.elu(w)
        return w / (w.sum(dim=0, keepdim=True) + eps)

    w1, w2 = norm(T(p["w1"])), norm(T(p["w2"]))
    up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear")
    down = lambda t: F.interpolate(t, scale_factor=0.5, mode="bilinear")

    p5_td = p5_x
    p4_td_sum = w1[0, 0] * p4_x + w1[1, 0] * up(p5_td)
    p4_td = c2f(
        dw_conv_block(p4_td_sum, p["p4_td_conv"], s["p4_td_conv"], training),
        p["p4_td_cf"], s["p4_td_cf"], p4_x.shape[1], training)
    p3_td_sum = w1[0, 1] * p3_x + w1[1, 1] * up(p4_td)
    p3_td = c2f(
        dw_conv_block(p3_td_sum, p["p3_td_conv"], s["p3_td_conv"], training),
        p["p3_td_cf"], s["p3_td_cf"], p3_x.shape[1], training)

    p3_out = p3_td
    p4_out_sum = (w2[0, 0] * p4_x + w2[1, 0] * p4_td + w2[2, 0] * down(p3_out))
    p4_out = c2f(
        dw_conv_block(p4_out_sum, p["p4_out_conv"], s["p4_out_conv"], training),
        p["p4_out_cf"], s["p4_out_cf"], p4_x.shape[1], training)
    p5_out_sum = (w2[0, 1] * p5_x + w2[1, 1] * p5_td + w2[2, 1] * down(p4_out))
    p5_out = c2f(
        dw_conv_block(p5_out_sum, p["p5_out_conv"], s["p5_out_conv"], training),
        p["p5_out_cf"], s["p5_out_cf"], p5_x.shape[1], training)
    return [p3_out, p4_out, p5_out]


def head_conv(x, p, s, k):
    """ultralytics Conv: conv(bias=False)+BN(1e-3)+SiLU, head BN in batch-
    stats mode (the reference force-toggles heads to .train(),
    main_model.py:356-362)."""
    p, s = p["ConvBN_0"], s["ConvBN_0"]
    x = F.conv2d(x, cw(p["Conv_0"]["kernel"]), None, padding=k // 2)
    x = _bn(x, p["BatchNorm_0"], s["BatchNorm_0"], True, BN_EPS_HEAD)
    return F.silu(x)


def detect_towers(feats, p, s, nc, reg_max=16):
    outs = []
    for i, x in enumerate(feats):
        b = head_conv(x, p[f"cv2_{i}_0"], s[f"cv2_{i}_0"], 3)
        b = head_conv(b, p[f"cv2_{i}_1"], s[f"cv2_{i}_1"], 3)
        b = F.conv2d(b, cw(p[f"cv2_{i}_2"]["kernel"]), T(p[f"cv2_{i}_2"]["bias"]))
        c = head_conv(x, p[f"cv3_{i}_0"], s[f"cv3_{i}_0"], 3)
        c = head_conv(c, p[f"cv3_{i}_1"], s[f"cv3_{i}_1"], 3)
        c = F.conv2d(c, cw(p[f"cv3_{i}_2"]["kernel"]), T(p[f"cv3_{i}_2"]["bias"]))
        outs.append(torch.cat([b, c], 1))
    return outs


def proto(x, p, s):
    """ultralytics Proto: cv1 -> ConvTranspose 2x -> cv2 -> cv3."""
    x = head_conv(x, p["cv1"], s["cv1"], 3)
    # flax ConvTranspose kernel [kh,kw,I,O] -> torch [I,O,kh,kw]; flax places
    # tap [a,b] at output offset [k-1-a,k-1-b], torch at [a,b] -> flip both
    # spatial dims (see test_weight_import.py::test_deconv_import_numerics)
    k_f = np.ascontiguousarray(np.asarray(p["upsample"]["kernel"])[::-1, ::-1])
    wt = T(k_f).permute(2, 3, 0, 1).contiguous()
    x = F.conv_transpose2d(x, wt, T(p["upsample"]["bias"]), stride=2)
    x = head_conv(x, p["cv2"], s["cv2"], 3)
    return head_conv(x, p["cv3"], s["cv3"], 1)


def torch_forward(x_nchw, params, stats, cfg):
    """Literal transcription of ConvNeXtBiFPNYOLO.forward(mode='train')
    under Lightning-eval semantics (body eval, heads train) —
    main_model.py:300-393."""
    bp, bs = params["backbone"], stats["backbone"]
    p3, p4, p5 = trunk_forward(x_nchw, bp["trunk"], cfg.backbone_depths)
    cp3 = c2f(p3, bp["c2f_p3"], bs["c2f_p3"], 256, False)
    cp4 = c2f(p4, bp["c2f_p4"], bs["c2f_p4"], 384, False)
    cp5 = c2f(p5, bp["c2f_p5"], bs["c2f_p5"], 512, False)

    np_, ns = params["neck"], stats["neck"]
    feats = [
        conv_block(cp3, np_["p3_proj"], ns["p3_proj"], 1, False),
        conv_block(cp4, np_["p4_proj"], ns["p4_proj"], 1, False),
        conv_block(cp5, np_["p5_proj"], ns["p5_proj"], 1, False),
    ]
    for i in range(cfg.bifpn_num_layers):
        feats = bifpn_unit(feats, np_[f"unit{i}"], ns[f"unit{i}"], False)

    det_feats = detect_towers(feats, params["detect"]["towers"],
                              stats["detect"]["towers"], cfg.nc_det)

    sp, ss = params["segment"], stats["segment"]
    protos = proto(feats[0], sp["proto"], ss["proto"])
    coeffs = []
    for i, f in enumerate(feats):
        m = head_conv(f, sp[f"cv4_{i}_0"], ss[f"cv4_{i}_0"], 3)
        m = head_conv(m, sp[f"cv4_{i}_1"], ss[f"cv4_{i}_1"], 3)
        m = F.conv2d(m, cw(sp[f"cv4_{i}_2"]["kernel"]), T(sp[f"cv4_{i}_2"]["bias"]))
        coeffs.append(m.permute(0, 2, 3, 1).reshape(m.shape[0], -1, cfg.proto_ch))
    coeffs = torch.cat(coeffs, 1)
    seg_det_raw = detect_towers(feats, sp["towers"], ss["towers"], cfg.nc_det)

    pooled = F.adaptive_avg_pool2d(feats[2], 1).flatten(1)
    cls_logits = F.linear(pooled, T(params["cls_fc"]["kernel"]).t(),
                          T(params["cls_fc"]["bias"]))
    # seg projector lives in the trainer in the reference
    # (running_main_v3.py:186, :251-255)
    proj = params["seg_proto_projector"]
    seg_logits = F.conv2d(protos, cw(proj["kernel"]), T(proj["bias"]))
    seg_logits = F.interpolate(seg_logits, size=(cfg.img_size, cfg.img_size),
                               mode="bilinear", align_corners=False)
    return dict(det_feats=det_feats, seg_det_raw=seg_det_raw, coeffs=coeffs,
                protos=protos, cls_logits=cls_logits, seg_logits=seg_logits)


# ------------------------------------------------------------ torch loss
def t_batch_bbox_iou(b1, b2, eps=1e-7):
    """running_main_v3.py:71-98."""
    ix1 = torch.max(b1[:, 0].unsqueeze(1), b2[:, 0].unsqueeze(0))
    iy1 = torch.max(b1[:, 1].unsqueeze(1), b2[:, 1].unsqueeze(0))
    ix2 = torch.min(b1[:, 2].unsqueeze(1), b2[:, 2].unsqueeze(0))
    iy2 = torch.min(b1[:, 3].unsqueeze(1), b2[:, 3].unsqueeze(0))
    inter = (ix2 - ix1).clamp(min=0) * (iy2 - iy1).clamp(min=0)
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / (a1.unsqueeze(1) + a2.unsqueeze(0) - inter + eps)


def t_dist2bbox(distance, anchor_points):
    lt, rb = torch.split(distance, 2, dim=-1)
    return torch.cat((anchor_points - lt, anchor_points + rb), -1)


def torch_multitask_loss(out, gt_boxes6, gt_masks, gt_img_cls, hp,
                         training=True):
    """Literal transcription of MultiTaskLitModel._multitask_loss
    (running_main_v3.py:232-387). Returns the component dict + diagnostics."""
    reg_max = hp["reg_max"]
    img_size = hp["img_size"]
    nc_det = hp["nc_det"]

    loss_img_cls = F.cross_entropy(out["cls_logits"], gt_img_cls)
    loss_seg = F.binary_cross_entropy_with_logits(out["seg_logits"], gt_masks)

    project = torch.arange(reg_max, dtype=torch.float32)
    det_head_outputs = out["det_feats"]
    batch_size = det_head_outputs[0].shape[0]
    strides = [img_size / f.shape[-1] for f in det_head_outputs]
    boxes_l, cls_l, dist_l, anch_l, strd_l = [], [], [], [], []
    for i, fm in enumerate(det_head_outputs):
        bs, ch, h, w = fm.shape
        sv = strides[i]
        flat = fm.permute(0, 2, 3, 1).reshape(bs, h * w, ch)
        dist_raw = flat[..., : reg_max * 4]
        cls_logits = flat[..., reg_max * 4:]
        probs = F.softmax(dist_raw.view(bs, h * w, 4, reg_max), dim=-1)
        ltrb = torch.einsum("ijkl,l->ijk", probs, project)
        gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                torch.arange(w, dtype=torch.float32),
                                indexing="ij")
        ap = torch.stack((gx + 0.5, gy + 0.5), -1).view(1, h * w, 2).repeat(bs, 1, 1)
        boxes_l.append(t_dist2bbox(ltrb * sv, ap * sv))
        cls_l.append(cls_logits)
        dist_l.append(dist_raw.view(bs, h * w, 4, reg_max))
        anch_l.append(ap)
        strd_l.append(torch.full((bs, h * w, 1), sv))
    pred_boxes = torch.cat(boxes_l, 1)
    pred_cls = torch.cat(cls_l, 1)
    pred_dist = torch.cat(dist_l, 1)
    anchors = torch.cat(anch_l, 1)
    stride_t = torch.cat(strd_l, 1)

    lb_iou, lb_cls, lb_dfl = 0.0, 0.0, 0.0
    n_pos = 0
    accum_iou = 0.0
    min_margin = 1e9  # diagnostic: distance of IoUs to the threshold
    for b in range(batch_size):
        info = gt_boxes6[gt_boxes6[:, 0] == b]
        if info.numel() == 0:
            continue
        gcls = info[:, 1].long()
        g = info[:, 2:6]
        gxyxy = torch.stack([
            (g[:, 0] - g[:, 2] / 2) * img_size,
            (g[:, 1] - g[:, 3] / 2) * img_size,
            (g[:, 0] + g[:, 2] / 2) * img_size,
            (g[:, 1] + g[:, 3] / 2) * img_size,
        ], -1)
        ious = t_batch_bbox_iou(pred_boxes[b], gxyxy)
        vmax, idx = ious.max(dim=1)
        min_margin = min(min_margin,
                         (vmax - hp["iou_match_thresh"]).abs().min().item())
        pos = vmax > hp["iou_match_thresh"]
        npos = int(pos.sum())
        if npos == 0:
            continue
        n_pos += npos
        mpb = pred_boxes[b][pos]
        mgb = gxyxy[idx[pos]]
        iou_m = t_batch_bbox_iou(mpb, mgb).diag()
        lb_iou = lb_iou + (1.0 - iou_m).sum()
        accum_iou += iou_m.sum().item()
        mcl = pred_cls[b][pos]
        mgc = gcls[idx[pos]]
        if hp["det_label_smoothing"] > 0.0 and training:
            sm = hp["det_label_smoothing"]
            conf = 1.0 - sm
            tgt = torch.full_like(mcl, sm / (nc_det - 1))
            tgt.scatter_(-1, mgc.unsqueeze(1), conf)
        else:
            tgt = F.one_hot(mgc, num_classes=nc_det).float()
        lb_cls = lb_cls + F.binary_cross_entropy_with_logits(
            mcl, tgt, reduction="sum")

        ap = anchors[b][pos]
        st = stride_t[b][pos]
        gt_ltrb = (torch.cat([ap * st - mgb[:, :2], mgb[:, 2:] - ap * st], -1)
                   / st).clamp(min=0, max=reg_max - 1.01)
        tl = gt_ltrb.floor().long().clamp(min=0, max=reg_max - 1)
        tr = (tl + 1).clamp(min=0, max=reg_max - 1)
        wl = tr.float() - gt_ltrb
        wr = gt_ltrb - tl.float()
        md = pred_dist[b][pos]
        item = 0.0
        for k in range(4):
            item = item + (F.cross_entropy(md[:, k, :], tl[:, k],
                                           reduction="none") * wl[:, k]).sum()
            item = item + (F.cross_entropy(md[:, k, :], tr[:, k],
                                           reduction="none") * wr[:, k]).sum()
        lb_dfl = lb_dfl + item

    avg = float(n_pos) if n_pos > 0 else float(batch_size)
    comp = dict(
        seg=float(loss_seg), img_cls=float(loss_img_cls),
        box_iou=float(lb_iou) / avg, cls_det=float(lb_cls) / avg,
        dfl=float(lb_dfl) / avg,
    )
    comp["total"] = (
        hp["w_seg"] * comp["seg"] + hp["w_box"] * comp["box_iou"]
        + hp["w_dfl"] * comp["dfl"] + hp["w_cls"] * comp["cls_det"]
        + hp["w_img"] * comp["img_cls"]
    )
    return comp, n_pos, (accum_iou / n_pos if n_pos else 0.0), min_margin


# ---------------------------------------------------------------- fixtures
def _randomize(variables, seed=0):
    """Perturb every param/stat so BN stats, LN scales and layer-scale
    gammas are all non-degenerate (init values would hide transpose bugs)."""
    rs = np.random.RandomState(seed)

    def perturb(path, x):
        x = np.asarray(x, np.float32)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "var":
            return x * rs.uniform(0.7, 1.4, x.shape).astype(np.float32)
        return x + 0.05 * rs.randn(*x.shape).astype(np.float32)

    return jax.tree_util.tree_map_with_path(perturb, variables)


@pytest.fixture(scope="module")
def setup():
    model = MultitaskModel(CFG)
    x = np.random.RandomState(1).rand(B, IMG, IMG, 3).astype(np.float32)
    # run flax at full fp32 precision: JAX CPU convs default to a reduced-
    # precision mode with ~1e-3 relative error that would mask real defects
    with jax.default_matmul_precision("highest"):
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                               train=False, mode="train")
        variables = _randomize(dict(variables))
        out, _ = model.apply(variables, jnp.asarray(x), train=False,
                             mode="train", mutable=["batch_stats"])
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    tout = torch_forward(T(x).permute(0, 3, 1, 2), params, stats, CFG)
    return x, out, tout, params, stats


def _close(flax_nhwc, torch_nchw, atol, what):
    a = np.asarray(flax_nhwc, np.float32)
    b = torch_nchw.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3, err_msg=what)


def test_forward_heads_match(setup):
    _, out, tout, _, _ = setup
    for i in range(3):
        _close(out["det_feats"][i], tout["det_feats"][i], 2e-3,
               f"detect level {i}")
    _close(out["protos"], tout["protos"], 2e-3, "protos")
    _close(out["seg_logits"], tout["seg_logits"], 2e-3, "seg_logits")
    np.testing.assert_allclose(
        np.asarray(out["seg_coeffs"]), tout["coeffs"].detach().numpy(),
        atol=2e-3, rtol=1e-3, err_msg="seg coeffs")
    np.testing.assert_allclose(
        np.asarray(out["cls_logits"]), tout["cls_logits"].detach().numpy(),
        atol=1e-3, rtol=1e-3, err_msg="cls logits")


def test_loss_matches_reference_transcription(setup):
    x, out, tout, params, stats = setup
    rs = np.random.RandomState(7)
    # padded GT (ours) and row-format GT (reference collate)
    boxes = np.zeros((B, M, 5), np.float32)
    valid = np.zeros((B, M), np.float32)
    rows = []
    for b in range(B):
        n = 2 + b  # 2 and 3 GT boxes
        for j in range(n):
            cls = rs.randint(0, 2)
            cx, cy = rs.uniform(0.25, 0.75, 2)
            w, h = rs.uniform(0.15, 0.4, 2)
            boxes[b, j] = (cls, cx, cy, w, h)
            valid[b, j] = 1.0
            rows.append((b, cls, cx, cy, w, h))
    gt_boxes6 = torch.tensor(rows, dtype=torch.float32)
    mask = (rs.rand(B, IMG, IMG, 1) > 0.7).astype(np.float32)
    img_cls = rs.randint(0, 2, B)

    lcfg = LossConfig(img_size=IMG, nc_det=2, iou_match_thresh=0.5)
    mine = multitask_loss(
        out,
        {"boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(valid),
         "mask": jnp.asarray(mask), "img_cls": jnp.asarray(img_cls)},
        lcfg, train=True,
    )

    hp = dict(reg_max=16, img_size=IMG, nc_det=2, iou_match_thresh=0.5,
              det_label_smoothing=0.1, w_seg=1.0, w_box=7.5, w_dfl=1.5,
              w_cls=0.5, w_img=1.0)
    ref, n_pos, avg_iou, margin = torch_multitask_loss(
        tout, gt_boxes6,
        T(mask).permute(0, 3, 1, 2), torch.from_numpy(img_cls).long(), hp,
        training=True,
    )
    # guard: no IoU sits within fp noise of the positive threshold, so the
    # two implementations provably assign the SAME positive set
    assert margin > 1e-4, f"seed produced a near-threshold tie ({margin})"
    assert int(mine.num_pos) == n_pos
    np.testing.assert_allclose(float(mine.avg_iou), avg_iou, atol=1e-4)
    for k in ("seg", "img_cls", "box_iou", "cls_det", "dfl"):
        np.testing.assert_allclose(
            float(mine.components[k]), ref[k], atol=5e-4, rtol=2e-3,
            err_msg=f"loss component {k}")
    np.testing.assert_allclose(float(mine.total), ref["total"],
                               atol=1e-3, rtol=2e-3)
