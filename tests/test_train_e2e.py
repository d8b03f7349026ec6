"""Minimum end-to-end slice (SURVEY.md §7): synthetic dataset -> loader ->
v2 single-head model -> jitted sharded train step -> loss decreases ->
validation metrics -> checkpoint save/restore round-trip. Runs on the
8-device virtual CPU mesh from conftest.

Marked ``slow``: the full-model fwd+bwd XLA compile alone takes several
minutes on CPU. Run with ``pytest tests/test_train_e2e.py --runslow``; the
same sharded train-step path is exercised on every round by the driver's
``__graft_entry__.dryrun_multichip`` (MULTICHIP_r{N}.json)."""

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
    CheckpointManager,
)
from multitask_bonetumor_yolo_tpu.train.loop import ExperimentConfig, Trainer

pytestmark = pytest.mark.slow

IMG = 128


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    # 48 items -> val split ~10, enough for one full batch of 8
    return make_synthetic_btxrd(
        str(tmp_path_factory.mktemp("btxrd_e2e")), n=48, seed=7,
        min_size=160, max_size=320,
    )


@pytest.fixture(scope="module")
def cfg(synth_root):
    return ExperimentConfig(
        model=ModelConfig(img_size=IMG, single_head=True, nc_det=2, nc_img=2),
        # batch_size is PER-DEVICE (global = x8 on the virtual mesh);
        # 1 keeps the 38-image train split yielding full global batches
        data=DataConfig(root=str(synth_root), img_size=IMG, max_boxes=8,
                        batch_size=1),
        loss=LossConfig(img_size=IMG, nc_det=2, iou_match_thresh=0.15),
        train=TrainConfig(lr=3e-4, max_epochs=3, early_stop_patience=100,
                          seed=0, eval_top_k=50),
        run_dir="",  # set per-test
    )


def test_loss_decreases_over_steps(cfg, tmp_path):
    state = create_train_state(cfg.model, cfg.train)
    step_fn = make_train_step(cfg.model, cfg.loss, AugmentConfig(), donate=False)
    ds = BTXRD(cfg.data, "train")
    batch = next(iter(BTXRDLoader(ds, 8, shuffle=False)))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    losses = []
    for i in range(25):
        state, metrics, _ = step_fn(state, jbatch, rng)
        losses.append(float(metrics["loss_total"]))
    assert np.isfinite(losses).all()
    # overfit one batch: clear decrease
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses


def test_trainer_fit_and_validate(cfg, tmp_path):
    cfg = dataclasses.replace(cfg, run_dir=str(tmp_path / "run"), log_every=1)
    trainer = Trainer(cfg)
    state = trainer.fit(max_epochs=2)
    assert int(state.step) == 2 * trainer.train_cfg.steps_per_epoch
    # metrics jsonl exists and has val epoch rows
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    assert any('"val_epoch/map_iou50_map"' in l for l in lines)
    assert any('"val_epoch/seg_dice"' in l for l in lines)
    assert any('"val_epoch/img_accuracy"' in l for l in lines)
    # checkpoint written + restorable
    ckpt = trainer.ckpt
    assert ckpt.last_path() is not None
    fresh = create_train_state(cfg.model, trainer.train_cfg)
    restored = ckpt.restore(fresh)
    assert int(restored.step) == int(state.step)
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))


def test_checkpoint_topk_pruning(cfg, tmp_path):
    state = create_train_state(
        dataclasses.replace(cfg.model, img_size=64),
        cfg.train,
    )
    cm = CheckpointManager(str(tmp_path / "ck"), top_k=2)
    cm.save(state, 1, metric=0.1)
    cm.save(state, 2, metric=0.5)
    cm.save(state, 3, metric=0.3)
    cm.save(state, 4, metric=0.2)  # last, kept despite low metric
    names = set(cm._index.keys())
    assert names == {"step_00000002", "step_00000003", "step_00000004"}
    assert cm.best_path().name == "step_00000002"
    assert cm.last_path().name == "step_00000004"


def test_trainer_resume_auto(cfg, tmp_path):
    cfg = dataclasses.replace(cfg, run_dir=str(tmp_path / "run"))
    t1 = Trainer(cfg)
    t1.fit(max_epochs=1)
    step1 = int(t1.state.step)
    assert step1 > 0
    t2 = Trainer(cfg, resume="auto")
    assert int(t2.state.step) == step1
    # resumed fit continues the epoch count rather than restarting
    t2.fit(max_epochs=2)
    assert int(t2.state.step) == 2 * t2.train_cfg.steps_per_epoch


def test_eval_step_shapes(cfg):
    tc = dataclasses.replace(cfg.train, steps_per_epoch=1)
    state = create_train_state(cfg.model, tc)
    eval_fn = make_eval_step(cfg.model, cfg.loss, tc)
    ds = BTXRD(cfg.data, "val")
    batch = next(iter(BTXRDLoader(ds, 8)))
    if batch["image"].shape[0] != 8:
        pytest.skip("val split smaller than one batch")
    metrics, aux = eval_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
    assert aux["nms_boxes"].shape == (8, 50, 4)
    assert aux["seg_prob"].shape == (8, IMG, IMG, 1)
    assert np.isfinite(float(metrics["loss_total"]))


def test_sharded_train_step_runs_on_mesh(cfg):
    mesh = create_mesh()  # 8 virtual CPU devices
    assert mesh.devices.size == 8
    tc = dataclasses.replace(cfg.train, steps_per_epoch=1)
    state = create_train_state(cfg.model, tc)
    step_fn = make_train_step(cfg.model, cfg.loss, AugmentConfig(), donate=False)
    ds = BTXRD(cfg.data, "train")
    batch = next(iter(BTXRDLoader(ds, 8)))
    sharded = shard_batch(batch, mesh)
    # image batch dim is sharded across all 8 devices
    assert len(sharded["image"].sharding.device_set) == 8
    state2, metrics, _ = step_fn(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state2.step) == 1
