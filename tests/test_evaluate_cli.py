"""cli.evaluate config plumbing (VERDICT r3 #5): the Trainer persists the
model/loss config next to its checkpoints; evaluate defaults its flags from
it (so a frozen-BN- or TAL-trained checkpoint is never silently evaluated
under parity defaults), raises on explicit contradictions, and runs its
eval step sharded over the full device mesh.

Reference interface being upgraded: /root/reference/src/evaluate_model.py
:370-424 hardcodes the model hyperparameters and runs un-sharded.
"""

import dataclasses
import json
from pathlib import Path
from types import SimpleNamespace

import pytest

from multitask_bonetumor_yolo_tpu.cli.evaluate import (
    evaluate,
    make_parser,
    resolve_config,
)
from multitask_bonetumor_yolo_tpu.data import DataConfig, make_synthetic_btxrd
from multitask_bonetumor_yolo_tpu.losses import LossConfig
from multitask_bonetumor_yolo_tpu.models import ModelConfig
from multitask_bonetumor_yolo_tpu.train import TrainConfig
from multitask_bonetumor_yolo_tpu.train.loop import ExperimentConfig, Trainer

from tests.test_train_fast import IMG, TINY_MODEL


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """One tiny NON-parity-default training run: frozen BN + TAL assigner."""
    root = make_synthetic_btxrd(
        str(tmp_path_factory.mktemp("btxrd_eval")), n=16, seed=11,
        min_size=96, max_size=160,
    )
    run_dir = tmp_path_factory.mktemp("run")
    cfg = ExperimentConfig(
        model=ModelConfig(**TINY_MODEL, eval_bn="frozen",
                          fuse_towers=False, ln_zfree=False,
                          block_bwd="ref"),
        data=DataConfig(root=str(root), img_size=IMG, max_boxes=8,
                        batch_size=1),
        loss=LossConfig(img_size=IMG, nc_det=2, assigner="tal"),
        train=TrainConfig(lr=3e-4, max_epochs=1, early_stop_patience=100,
                          seed=0, eval_top_k=10, save_last_every=1),
        run_dir=str(run_dir),
    )
    trainer = Trainer(cfg)
    trainer.fit(max_epochs=1)
    return SimpleNamespace(root=root, run_dir=run_dir,
                           ckpt=trainer.ckpt.last_path())


def _args(trained_run, extra=()):
    return make_parser().parse_args(
        ["--checkpoint-path", str(trained_run.ckpt)] + list(extra)
    )


def test_trainer_writes_config_sidecar(trained_run):
    p = Path(trained_run.ckpt).parent / "config.json"
    assert p.exists()
    cfg = json.loads(p.read_text())
    assert cfg["model"]["eval_bn"] == "frozen"
    assert cfg["loss"]["assigner"] == "tal"
    assert cfg["model"]["single_head"] is True


def test_sidecar_roundtrips_perf_knobs(trained_run):
    """The executed graph is fully determined by config.json (VERDICT r4
    #6): the performance knobs (fuse_towers / ln_zfree / block_bwd) are
    serialized, and reconstructing ModelConfig from the sidecar — exactly
    what cli/evaluate.py does — reproduces the trained config."""
    p = Path(trained_run.ckpt).parent / "config.json"
    cfg = json.loads(p.read_text())
    assert cfg["model"]["fuse_towers"] is False
    assert cfg["model"]["ln_zfree"] is False
    assert cfg["model"]["block_bwd"] == "ref"
    assert cfg["data"]["upload_streams"] == DataConfig().upload_streams
    rebuilt = ModelConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in cfg["model"].items()
    })
    expected = ModelConfig(**TINY_MODEL, eval_bn="frozen",
                           fuse_towers=False, ln_zfree=False,
                           block_bwd="ref")
    assert rebuilt == expected


def test_env_knob_overrides_warn():
    """Env-var knobs are experiment-only overrides: they win but WARN, so a
    run whose behaviour deviates from its sidecar is visible (utils/knobs)."""
    import os
    import warnings

    from multitask_bonetumor_yolo_tpu.utils import knobs

    os.environ["MTBY_TEST_KNOB"] = "0"
    try:
        knobs._warned.discard("MTBY_TEST_KNOB")
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            assert knobs.env_override("MTBY_TEST_KNOB", True) is False
        assert any("overrides the typed config" in str(w.message) for w in rec)
        # unset -> config value wins, no warning
        del os.environ["MTBY_TEST_KNOB"]
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            assert knobs.env_override("MTBY_TEST_KNOB", True) is True
        assert not rec
    finally:
        os.environ.pop("MTBY_TEST_KNOB", None)


def test_flags_default_from_trained_config(trained_run):
    args = _args(trained_run)
    resolve_config(args)
    assert args.eval_bn == "frozen"
    assert args.assigner == "tal"
    assert args.single_head is True
    assert args.nc_det == 2


def test_explicit_mismatch_raises(trained_run):
    args = _args(trained_run, ["--eval-bn", "reference"])
    with pytest.raises(ValueError, match="eval-bn.*contradicts"):
        resolve_config(args)


def test_mismatch_override_flag(trained_run):
    args = _args(trained_run,
                 ["--eval-bn", "reference", "--allow-config-mismatch"])
    resolve_config(args)
    assert args.eval_bn == "reference"  # forced
    assert args.assigner == "tal"  # still defaulted from config


def test_parity_defaults_without_sidecar(trained_run, tmp_path):
    """A checkpoint with no config.json (e.g. reference-converted weights)
    falls back to the documented parity defaults."""
    args = make_parser().parse_args(
        ["--checkpoint-path", str(tmp_path / "nodir" / "step_00000001")]
    )
    resolve_config(args)
    assert args.eval_bn == "reference"
    assert args.assigner == "reference"
    assert args.single_head is False


def test_evaluate_runs_sharded_with_defaulted_flags(trained_run, tmp_path):
    """End-to-end: evaluate with NO model flags picks up the trained config
    and runs the full metric suite over the 8-device CPU mesh."""
    args = _args(trained_run, [
        "--root", str(trained_run.root), "--split", "val",
        "--img-size", str(IMG), "--batch-size", "1", "--max-boxes", "8",
        "--run-dir", str(tmp_path / "eval"), "--dtype", "float32",
        "--map-thresholds", "10",
    ])
    out = evaluate(args)
    assert args.eval_bn == "frozen" and args.assigner == "tal"
    for key in ("map_iou50_map", "seg_dice", "img_accuracy"):
        assert key in out, sorted(out)
