"""Experiment-override environment knobs.

The typed ``ExperimentConfig`` tree (SURVEY.md §5 config row: "one typed
config dataclass tree ... no globals") is the single source of truth for
every behaviour-changing switch — the Trainer serialises it into the
``config.json`` sidecar, so a run's executed graph is reconstructable from
its recorded config. Environment variables remain available as
EXPERIMENT-ONLY overrides for A/B sweeps (scripts/sweep_block.py etc.);
each one warns once when set so an overridden run is visibly not a
config-described run.

Note on trace-time capture (ADVICE r4): overrides are read when the model
is TRACED, and config fields participate in jit cache keys via the frozen
``ModelConfig`` dataclass — toggling an env var after a step is compiled
has no effect on the cached executable.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional, TypeVar

T = TypeVar("T")

_warned: set = set()


def env_override(env_name: str, value: T) -> T:
    """``value`` unless the env var is set, in which case the env wins
    (cast to ``type(value)``; bools accept 0/1) with a one-time warning."""
    raw = os.environ.get(env_name)
    if raw is None or raw == "":
        return value
    if env_name not in _warned:
        _warned.add(env_name)
        warnings.warn(
            f"{env_name}={raw!r} overrides the typed config (value was "
            f"{value!r}); this run's behaviour is NOT described by its "
            f"config.json sidecar",
            stacklevel=2,
        )
    if isinstance(value, bool):
        return raw not in ("0", "false", "False")  # type: ignore[return-value]
    if isinstance(value, int):
        return int(raw)  # type: ignore[return-value]
    if isinstance(value, float):
        return float(raw)  # type: ignore[return-value]
    return raw  # type: ignore[return-value]


def env_override_optional(env_name: str, value: Optional[int]) -> Optional[int]:
    """Like :func:`env_override` for Optional[int]-typed knobs."""
    raw = os.environ.get(env_name)
    if raw is None or raw == "":
        return value
    if env_name not in _warned:
        _warned.add(env_name)
        warnings.warn(
            f"{env_name}={raw!r} overrides the typed config (value was "
            f"{value!r})", stacklevel=2,
        )
    return int(raw)
