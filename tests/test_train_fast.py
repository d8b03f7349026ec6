"""Fast verification tier for the trainer loop (VERDICT r2 #10): one shared
tiny model config (64px, 1-block backbone stages, 1 BiFPN layer) whose full
train+eval compile takes ~1.5 min cold / seconds warm (persistent cache in
conftest), reused across every Trainer.fit logic test — checkpoint cadence,
early stop, resume, warm start, multi-device equivalence. The 640-scale
versions stay in test_train_e2e.py behind --runslow."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multitask_bonetumor_yolo_tpu.data import (
    BTXRD,
    BTXRDLoader,
    DataConfig,
    make_synthetic_btxrd,
)
from multitask_bonetumor_yolo_tpu.data.preprocess import AugmentConfig
from multitask_bonetumor_yolo_tpu.losses import LossConfig
from multitask_bonetumor_yolo_tpu.models import ModelConfig
from multitask_bonetumor_yolo_tpu.parallel import create_mesh, shard_batch
from multitask_bonetumor_yolo_tpu.train import (
    TrainConfig,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from multitask_bonetumor_yolo_tpu.train.loop import ExperimentConfig, Trainer

IMG = 64
TINY_MODEL = dict(
    img_size=IMG, single_head=True, nc_det=2, nc_img=2,
    backbone_depths=(1, 1, 1, 1), backbone_dims=(16, 24, 32, 48),
    bifpn_num_layers=1,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    return make_synthetic_btxrd(
        str(tmp_path_factory.mktemp("btxrd_fast")), n=16, seed=11,
        min_size=96, max_size=160,
    )


@pytest.fixture(scope="module")
def cfg(synth_root):
    return ExperimentConfig(
        model=ModelConfig(**TINY_MODEL),
        data=DataConfig(root=str(synth_root), img_size=IMG, max_boxes=8,
                        batch_size=1),
        loss=LossConfig(img_size=IMG, nc_det=2, iou_match_thresh=0.15),
        train=TrainConfig(lr=3e-4, max_epochs=3, early_stop_patience=100,
                          seed=0, eval_top_k=10, save_last_every=1),
        run_dir="",  # set per-test
    )


def test_trainer_fit_validate_checkpoint(cfg, tmp_path):
    cfg = dataclasses.replace(cfg, run_dir=str(tmp_path / "run"), log_every=1)
    trainer = Trainer(cfg)
    state = trainer.fit(max_epochs=2)
    assert int(state.step) == 2 * trainer.train_cfg.steps_per_epoch
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    assert any('"val_epoch/map_iou50_map"' in l for l in lines)
    assert any('"val_epoch/seg_dice"' in l for l in lines)
    assert any('"val_epoch/img_accuracy"' in l for l in lines)
    ckpt = trainer.ckpt
    assert ckpt.last_path() is not None
    fresh = create_train_state(cfg.model, trainer.train_cfg)
    restored = ckpt.restore(fresh)
    assert int(restored.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(restored.params)[0]),
    )


def test_trainer_resume_auto(cfg, tmp_path):
    cfg = dataclasses.replace(cfg, run_dir=str(tmp_path / "run"))
    t1 = Trainer(cfg)
    t1.fit(max_epochs=1)
    step1 = int(t1.state.step)
    assert step1 > 0
    t2 = Trainer(cfg, resume="auto")
    assert int(t2.state.step) == step1
    t2.fit(max_epochs=2)
    assert int(t2.state.step) == 2 * t2.train_cfg.steps_per_epoch


def test_early_stop_and_checkpoint_cadence(cfg, tmp_path, monkeypatch):
    """Scripted val mAP50 drives the loop logic deterministically: the best
    epoch checkpoints immediately (top-K qualify), later non-improving
    epochs trip early stop after `patience`."""
    cfg = dataclasses.replace(
        cfg, run_dir=str(tmp_path / "run"),
        train=dataclasses.replace(cfg.train, early_stop_patience=2,
                                  save_last_every=1000),
    )
    trainer = Trainer(cfg)
    script = iter([0.1, 0.5, 0.4, 0.3, 0.2, 0.1, 0.1, 0.1])
    seen = []

    def fake_validate(epoch, global_step):
        m = next(script)
        seen.append(m)
        return {"map_iou50_map": m}

    monkeypatch.setattr(trainer, "validate", fake_validate)
    trainer.fit(max_epochs=100)
    # best at epoch 1 (0.5); patience 2 -> stops at epoch 3
    assert len(seen) == 4
    # top-2 checkpoints + final keep: saves happened on qualifying epochs
    assert trainer.ckpt.best_path() is not None


def test_multi_device_equivalence(cfg):
    """VERDICT r2 #5: the sharded train step must EQUAL the single-device
    step on the same global batch — the property that makes data-parallel
    training trustworthy. Also 1-D vs 2-D mesh."""
    tc = dataclasses.replace(cfg.train, steps_per_epoch=1)
    state = create_train_state(cfg.model, tc)
    step_fn = make_train_step(cfg.model, cfg.loss, AugmentConfig(), donate=False)
    ds = BTXRD(cfg.data, "train")
    batch = next(iter(BTXRDLoader(ds, 8, shuffle=False)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(7)

    s1, m1, _ = step_fn(state, jb, rng)  # single device
    mesh = create_mesh()
    s8, m8, _ = step_fn(state, shard_batch(batch, mesh), rng)
    # loss catches reduction bugs; grad_norm catches gradient SCALING bugs
    # (psum-vs-pmean) that Adam's scale invariance would otherwise hide
    np.testing.assert_allclose(
        float(m1["loss_total"]), float(m8["loss_total"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m8["grad_norm"]), rtol=1e-4
    )
    # post-Adam params compare at lr-scale atol only: where |g| ~ Adam eps,
    # cross-device fp reduction noise is amplified to O(update) — tight
    # rtol on params after the optimizer is not a meaningful equivalence
    for p1, p8 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p8), atol=2 * cfg.train.lr, rtol=0
        )
    mesh2 = create_mesh(8, model_parallel=2)
    s2d, m2d, _ = step_fn(state, shard_batch(batch, mesh2), rng)
    np.testing.assert_allclose(
        float(m8["loss_total"]), float(m2d["loss_total"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m8["grad_norm"]), float(m2d["grad_norm"]), rtol=1e-4
    )


def test_warm_start_cli_e2e(cfg, synth_root, tmp_path):
    """Flags -> load_pretrained -> training step (VERDICT r2 weak #6): drive
    the REAL cli.train main with --convnext-ckpt pointing at a real-format
    torch .pt; the backbone must carry the imported weights into fit()."""
    import torch

    from multitask_bonetumor_yolo_tpu.cli.train import main as train_main
    from tests.test_weight_import import make_timm_sd

    rng = np.random.RandomState(3)
    depths, dims = TINY_MODEL["backbone_depths"], TINY_MODEL["backbone_dims"]
    sd = make_timm_sd(rng, depths, dims)
    cpath = tmp_path / "convnext_tiny.pt"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, cpath)

    run_dir = tmp_path / "run"
    train_main([
        "--root", str(synth_root), "--run-dir", str(run_dir),
        "--img-size", str(IMG), "--batch-size", "1", "--epochs", "1",
        "--single-head", "--dtype", "float32",
        "--backbone-depths", ",".join(map(str, depths)),
        "--backbone-dims", ",".join(map(str, dims)),
        "--bifpn-layers", "1", "--iou-match-thresh", "0.15",
        "--map-max-detections", "10",
        "--convnext-ckpt", str(cpath),
    ])
    assert (run_dir / "metrics.jsonl").exists()
    # the saved checkpoint's backbone gamma must be the imported value, not
    # the 1e-6 layer-scale init — proof the warm start reached training
    from multitask_bonetumor_yolo_tpu.train import CheckpointManager

    cm = CheckpointManager(str(run_dir / "checkpoints"))
    state = cm.restore(create_train_state(
        cfg.model, dataclasses.replace(cfg.train, steps_per_epoch=1)
    ))
    got = np.asarray(
        state.params["backbone"]["trunk"]["stage0_block0"]["gamma"]
    )
    assert abs(got - sd["stages.0.blocks.0.gamma"]).max() < 0.1  # one AdamW step of drift
    assert got.max() > 1e-3  # not the fresh 1e-6 init


def test_eval_bn_frozen_deterministic(cfg):
    """ModelConfig.eval_bn='frozen' (VERDICT r2 #7): with identical params,
    eval metrics are identical no matter which train batch ran last. Under
    'reference' the same experiment shows the documented jitter."""
    results = {}
    for mode in ("reference", "frozen"):
        mcfg = dataclasses.replace(cfg.model, eval_bn=mode)
        tc = dataclasses.replace(cfg.train, steps_per_epoch=1)
        state = create_train_state(mcfg, tc)
        step_fn = make_train_step(mcfg, cfg.loss, AugmentConfig(), donate=False)
        eval_fn = make_eval_step(mcfg, cfg.loss, tc)
        ds = BTXRD(cfg.data, "train")
        loader = list(BTXRDLoader(ds, 8, shuffle=False))
        b0 = {k: jnp.asarray(v) for k, v in loader[0].items()}
        rng = jax.random.PRNGKey(0)
        # drive batch_stats far from init with a big constant batch, then
        # perturb with one different batch; params are NOT updated
        hot = dict(b0)
        hot["image"] = jnp.asarray(
            np.full_like(np.asarray(b0["image"]), 255)
        )
        _, _, _ = step_fn(state, b0, rng)
        s_a, _, _ = step_fn(state, hot, rng)  # stats after 'hot' batch
        s_b, _, _ = step_fn(state, b0, rng)  # stats after normal batch
        # evaluate the SAME params under the two different last-train-batch
        # stats (state params untouched: use original params w/ each stats)
        ea, _ = eval_fn(
            state.replace(batch_stats=s_a.batch_stats, params=state.params), b0
        )
        eb, _ = eval_fn(
            state.replace(batch_stats=s_b.batch_stats, params=state.params), b0
        )
        results[mode] = abs(float(ea["loss_total"]) - float(eb["loss_total"]))
    # frozen: last-batch dependence shrinks by orders of magnitude
    assert results["frozen"] < results["reference"] * 0.2, results


def test_multi_device_equivalence_midsize_dual_head(synth_root):
    """VERDICT r3 #6: equivalence at realistic structure — 160², v1 DUAL
    head (Detect + Segment), 3 GT boxes per sample — not only the 64²
    single-head toy. Tiny trunk dims keep the fast tier fast; head channels,
    strides, multi-GT assignment and the full loss run at real structure."""
    img = 160
    mcfg = ModelConfig(
        img_size=img, single_head=False, nc_det=2, nc_img=2,
        backbone_depths=(1, 1, 1, 1), backbone_dims=(16, 24, 32, 48),
        bifpn_num_layers=1,
    )
    lcfg = LossConfig(img_size=img, nc_det=2, iou_match_thresh=0.15)
    tc = TrainConfig(lr=3e-4, steps_per_epoch=1, seed=0)
    state = create_train_state(mcfg, tc)
    step_fn = make_train_step(mcfg, lcfg, AugmentConfig(), donate=False)

    rng = np.random.RandomState(4)
    b, m = 8, 4
    boxes = np.zeros((b, m, 5), np.float32)
    valid = np.zeros((b, m), bool)
    for i in range(b):
        for j in range(3):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.2, 0.45, 2)
            boxes[i, j] = (rng.randint(0, 2), cx, cy, w, h)
            valid[i, j] = True
    batch = {
        "image": rng.randint(0, 255, (b, img, img, 3)).astype(np.uint8),
        "boxes": boxes, "box_valid": valid,
        "mask": rng.rand(b, img, img, 1).astype(np.float32).round(),
        "img_cls": (np.arange(b) % 2).astype(np.int32),
        "id": np.arange(b, dtype=np.int32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(3)

    s1, m1, _ = step_fn(state, jb, key)
    mesh = create_mesh()
    s8, m8, _ = step_fn(state, shard_batch(batch, mesh), key)
    np.testing.assert_allclose(
        float(m1["loss_total"]), float(m8["loss_total"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m8["grad_norm"]), rtol=1e-4
    )
    for p1, p8 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p8), atol=2 * tc.lr, rtol=0
        )


def test_apply_gradients_skips_nonfinite():
    """A NaN/inf gradient must not poison params, opt-state, or batch-stats
    (AdamW moments are otherwise unrecoverable); a finite gradient after a
    skipped step must still apply normally."""
    from multitask_bonetumor_yolo_tpu.train.state import (
        TrainState, make_optimizer,
    )

    tc = TrainConfig(lr=1e-2, steps_per_epoch=1)
    params = {"w": jnp.ones((4,), jnp.float32)}
    stats = {"bn": {"mean": jnp.zeros((4,), jnp.float32)}}
    tx = make_optimizer(tc)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats,
        opt_state=tx.init(params), tx=tx,
    )

    bad = {"w": jnp.array([1.0, jnp.nan, 0.0, 0.0])}
    bad_stats = {"bn": {"mean": jnp.full((4,), jnp.nan)}}
    s1, ok1 = state.apply_gradients(grads=bad, batch_stats=bad_stats)
    assert not bool(ok1)  # the skip is SURFACED, not silent (ADVICE r4)
    assert int(s1.step) == 1  # scheduler still advances
    np.testing.assert_array_equal(np.asarray(s1.params["w"]), np.ones(4))
    assert np.isfinite(np.asarray(s1.batch_stats["bn"]["mean"])).all()
    for a, b in zip(jax.tree.leaves(s1.opt_state), jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    good = {"w": jnp.full((4,), 0.5)}
    s2, ok2 = s1.apply_gradients(grads=good, batch_stats=stats)
    assert bool(ok2)
    assert (np.asarray(s2.params["w"]) != 1.0).all()
    assert np.isfinite(np.asarray(s2.params["w"])).all()

    # huge-but-finite gradients must NOT be skipped: the per-leaf isfinite
    # probe is immune to the fp32 sum-of-squares overflow a global-norm
    # probe suffers (clip_by_global_norm then salvages the step)
    huge = {"w": jnp.full((4,), 3e38)}
    s3, ok3 = s2.apply_gradients(grads=huge, batch_stats=stats)
    assert bool(ok3)
    assert np.isfinite(np.asarray(s3.params["w"])).all()
