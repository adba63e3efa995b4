"""Observability: structured metrics logging, profiling, numeric guards.

The reference has only tensorboard scalars + print (SURVEY §5.1/§5.5);
here logging is structured (JSONL per run, trivially greppable and
plottable), profiling is one context manager around ``jax.profiler``, and
NaN-guarding is explicit instead of the reference's inline ipdb tripwires
(``network/renderer.py:264``, ``network/spt_utils.py:137``).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax


class MetricsLogger:
    """Append-only JSONL metrics log + stdout mirror.

    One line per event: {"step": int, "wall": float, **scalars}.
    """

    def __init__(self, log_dir: str | Path, name: str = "train",
                 echo: bool = True):
        self.path = Path(log_dir) / f"{name}.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._t0 = time.time()
        self.echo = echo

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        row = {"step": int(step), "wall": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        with self.path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        if self.echo:
            print(f"[{row['wall']:>8.1f}s] step {step} "
                  + " ".join(f"{k}={v:.4g}" for k, v in row.items()
                             if isinstance(v, float) and k != "wall"))

    def read(self) -> list:
        if not self.path.exists():
            return []
        return [json.loads(l) for l in self.path.read_text().splitlines()]


@contextlib.contextmanager
def profile_trace(log_dir: str | Path, enabled: bool = True):
    """``jax.profiler`` trace context (view with TensorBoard/Perfetto)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Enable jax NaN debugging for a scope (test-mode numeric sanitizer)."""
    if not enabled:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite_tree(tree: Any, name: str = "tree") -> None:
    """Raise with the offending path if any leaf has NaN/Inf."""
    import jax.numpy as jnp
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    bad = [jax.tree_util.keystr(p) for p, v in flat
           if not bool(jnp.isfinite(v).all())]
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")


def seed_everything(seed: int = 2022):
    """Deterministic seeding (reference utils/seed.py + trainer.py:275).

    Returns a jax PRNGKey; numpy's global RNG is also seeded for data code.
    """
    import numpy as np
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
