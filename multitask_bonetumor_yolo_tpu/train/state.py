"""Train state + optimizer.

Parity target: ``configure_optimizers``
(/root/reference/src/running_main_v3.py:732-743): AdamW(lr 1e-4, wd 5e-4) +
CosineAnnealingLR(T_max=max_epochs, eta_min=lr*0.01), with Lightning's
``gradient_clip_val=10.0`` (:826). Here: optax.adamw under a per-step cosine
schedule (decay_steps = max_epochs * steps_per_epoch, alpha = 0.01) chained
after global-norm clipping — same trajectory, stepped per optimizer step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import MultitaskModel, ModelConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    weight_decay: float = 5e-4
    max_epochs: int = 500
    steps_per_epoch: int = 100  # set from the dataset by the loop
    grad_clip: float = 10.0
    cosine_alpha: float = 0.01  # eta_min = lr * alpha
    seed: int = 123
    early_stop_patience: int = 50  # epochs without mAP50 improvement
    map_full_freq: int = 5  # epochs between full mAP50-95 computes
    ckpt_dir: str = "checkpoints"
    ckpt_top_k: int = 2
    # epochs between unconditional 'last' saves; top-K-qualifying metrics
    # always save immediately. The reference's Lightning stack writes
    # last.ckpt every epoch to fast local disk; here a full state transfer
    # rides the TPU relay at ~9 MB/s (~35 s), so 'last' is throttled.
    save_last_every: int = 5
    eval_conf_thresh: float = 0.05
    eval_nms_iou: float = 0.6
    eval_top_k: int = 100


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        """Apply one optimizer step, SKIPPING it if the gradient is non-finite.

        A single inf/NaN gradient would otherwise poison AdamW's moments and
        the params irreversibly (clip_by_global_norm propagates NaN). On a
        skipped step the params/opt-state/batch-stats are kept and only the
        step counter advances; the select costs ~0.4 ms/step for the 28 M-param
        model (bandwidth-bound) — cheap insurance for long unattended runs.
        The reference's Lightning stack has no such guard; this is a
        deliberate robustness improvement (running_main_v3.py:826 clips only).

        Non-finiteness is probed per-leaf with ``jnp.isfinite(g).all()``
        rather than via the squared global norm — a huge-but-finite gradient
        (one clip_by_global_norm would have salvaged) overflows the fp32
        sum-of-squares to inf and would be spuriously skipped (ADVICE r4).

        Returns ``(new_state, ok)`` — ``ok`` is a device bool (True = the
        step was applied) so the train step can surface skipped steps in
        its metrics instead of freezing silently.
        """
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        ok = jax.tree.reduce(
            jnp.logical_and,
            jax.tree.map(lambda g: jnp.isfinite(g).all(), grads),
            jnp.bool_(True),
        )

        def pick(new, old):
            return jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new, old
            )

        return self.replace(
            step=self.step + 1,
            params=pick(new_params, self.params),
            batch_stats=pick(batch_stats, self.batch_stats),
            opt_state=pick(new_opt, self.opt_state),
        ), ok


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.lr,
        decay_steps=max(1, cfg.max_epochs * cfg.steps_per_epoch),
        alpha=cfg.cosine_alpha,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def lr_at(cfg: TrainConfig, step: int) -> float:
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.lr,
        decay_steps=max(1, cfg.max_epochs * cfg.steps_per_epoch),
        alpha=cfg.cosine_alpha,
    )
    return float(schedule(step))


def create_train_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    rng: Optional[jax.Array] = None,
    params: Optional[Any] = None,
    batch_stats: Optional[Any] = None,
) -> TrainState:
    """Initialise (jitted — flax eager init is pathologically slow on TPU)."""
    model = MultitaskModel(model_cfg)
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(train_cfg.seed)

        @jax.jit
        def init(key):
            x = jnp.zeros((1, model_cfg.img_size, model_cfg.img_size, 3))
            return model.init(key, x, train=True, mode="train")

        variables = init(rng)
        params = variables["params"]
        batch_stats = variables["batch_stats"]
    tx = make_optimizer(train_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
