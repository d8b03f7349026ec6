"""Orbax-backed checkpointing with top-K-on-metric + save-last semantics.

Parity target: Lightning ModelCheckpoint at
/root/reference/src/running_main_v3.py:799-805 — save_top_k=2 monitoring
val mAP50 (mode max), save_last=True — plus restore-for-eval
(evaluate_model.py:60-65). Checkpoints hold {params, batch_stats, opt_state,
step} with a sidecar metrics.json so 'best' selection survives restarts.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

_CONCAT_CACHE: Dict[Any, Any] = {}


def _fetch_tree_batched(tree):
    """Device tree -> host (numpy) tree via ONE device->host transfer per
    dtype group instead of one per leaf.

    The TPU relay in this environment adds a fixed ~29 ms round-trip to
    EVERY fetch; a train state has ~1000 leaves (params + AdamW m/v), so
    leaf-wise fetching costs ~30 s/checkpoint. Concatenating on device and
    fetching once per dtype cuts the epoch's checkpoint phase from 33 s to
    ~1 s (measured in the round-2 evidence run)."""
    leaves, treedef = jax.tree.flatten(tree)
    by_dtype: Dict[Any, list] = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and leaf.size > 0:
            by_dtype.setdefault(jnp.asarray(leaf).dtype, []).append(i)
    host = list(leaves)

    # one jitted dispatch for ALL groups (eager per-leaf ravels would pay
    # the relay's dispatch cost ~500 times); the jitted fn is cached by the
    # leaves' structure so repeated saves don't retrace
    sig = tuple(
        (tuple(leaf.shape), str(leaf.dtype)) if isinstance(leaf, jax.Array)
        else None
        for leaf in leaves
    )
    key = (treedef, sig)
    fn = _CONCAT_CACHE.get(key)
    if fn is None:
        groups = tuple(tuple(idxs) for idxs in by_dtype.values())

        @jax.jit
        def fn(arrs):
            return tuple(
                jnp.concatenate([jnp.ravel(arrs[i]) for i in idxs])
                for idxs in groups
            )

        _CONCAT_CACHE[key] = fn
    arrays = {i: leaves[i] for idxs in by_dtype.values() for i in idxs}
    flats = fn(arrays)
    for (dtype, idxs), flat in zip(by_dtype.items(), flats):
        buf = np.asarray(flat)  # ONE fetch for the whole group
        off = 0
        for i in idxs:
            n = leaves[i].size
            host[i] = buf[off : off + n].reshape(leaves[i].shape)
            off += n
    # remaining leaves (python scalars, 0-size, non-arrays) pass through,
    # fetched individually (cheap: there are only a handful)
    for i, leaf in enumerate(host):
        if isinstance(leaf, jax.Array):
            host[i] = np.asarray(leaf)
    return jax.tree.unflatten(treedef, host)


class CheckpointManager:
    def __init__(self, directory: str, top_k: int = 2, mode: str = "max"):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.mode = mode
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = self.dir / "index.json"
        self._index: Dict[str, dict] = {}
        if self._index_path.exists():
            self._index = json.loads(self._index_path.read_text())

    # ------------------------------------------------------------------
    def _write_index(self) -> None:
        self._index_path.write_text(json.dumps(self._index, indent=2))

    def _tree(self, state) -> Dict[str, Any]:
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    def qualifies(self, metric: Optional[float]) -> bool:
        """Would ``metric`` enter the current top-K?"""
        if metric is None:
            return False
        scored = [v["metric"] for v in self._index.values()
                  if v["metric"] is not None]
        if len(scored) < self.top_k:
            return True
        sign = 1.0 if self.mode == "max" else -1.0
        worst = min(scored, key=lambda m: sign * m)
        return sign * metric > sign * worst

    def save(self, state, step: int, metric: Optional[float] = None,
             epoch: Optional[int] = None) -> Path:
        """Save as step_{step}; prune to top-K by metric, always keeping the
        newest ('last') checkpoint."""
        name = f"step_{step:08d}"
        path = self.dir / name
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path, _fetch_tree_batched(self._tree(state)))
        self._ckptr.wait_until_finished()
        self._index[name] = {
            "step": step,
            "metric": metric,
            "epoch": epoch,
        }
        self._prune()
        self._write_index()
        return path

    def _prune(self) -> None:
        names = sorted(self._index, key=lambda n: self._index[n]["step"])
        if not names:
            return
        last = names[-1]
        scored = [n for n in names if self._index[n]["metric"] is not None]
        sign = 1.0 if self.mode == "max" else -1.0
        ranked = sorted(
            scored, key=lambda n: sign * self._index[n]["metric"], reverse=True
        )
        keep = set(ranked[: self.top_k]) | {last}
        for n in names:
            if n not in keep:
                shutil.rmtree(self.dir / n, ignore_errors=True)
                del self._index[n]

    # ------------------------------------------------------------------
    def best_path(self) -> Optional[Path]:
        scored = [n for n in self._index if self._index[n]["metric"] is not None]
        if not scored:
            return self.last_path()
        sign = 1.0 if self.mode == "max" else -1.0
        best = max(scored, key=lambda n: sign * self._index[n]["metric"])
        return self.dir / best

    def last_path(self) -> Optional[Path]:
        if not self._index:
            return None
        last = max(self._index, key=lambda n: self._index[n]["step"])
        return self.dir / last

    def restore(self, state, path: Optional[str] = None):
        """Restore into an abstractly-matching TrainState (created with the
        same configs). path=None restores 'last'."""
        target = Path(path) if path else self.last_path()
        if target is None or not Path(target).exists():
            raise FileNotFoundError(f"No checkpoint at {target}")
        abstract = jax.tree.map(
            ocp.utils.to_shape_dtype_struct, self._tree(state)
        )
        restored = self._ckptr.restore(Path(target).absolute(), abstract)
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
