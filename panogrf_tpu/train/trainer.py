"""Step-based trainer (optax + orbax), reference ``train/trainer.py:33-477``.

Differences by design:
* one jitted train_step closing over the model apply + loss registry (the
  reference's eager loop with ``.backward()`` becomes a pure function),
* checkpoints via orbax (reference: single ``model.pth`` torch dict),
* deterministic seeding from cfg (reference seeds 2022,
  ``trainer.py:275-277``),
* optional data-parallel step over a mesh (see panogrf_tpu/parallel).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from panogrf_tpu.train.losses import NAME2LOSS, total_loss
from panogrf_tpu.train.lr import NAME2LR

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any
    extra: Any = None          # e.g. batch_stats


@dataclasses.dataclass
class TrainerConfig:
    name: str = "run"
    total_step: int = 100000
    val_interval: int = 10000
    save_interval: int = 20000
    lr_type: str = "exp_decay"
    lr_cfg: dict = dataclasses.field(default_factory=lambda: {
        "lr_init": 4e-4, "decay_step": 20000, "decay_rate": 0.5})
    losses: tuple = ("render",)
    loss_kwargs: dict = dataclasses.field(default_factory=dict)
    grad_clip: Optional[float] = None
    seed: int = 2022
    save_dir: str = "data/model"
    log_interval: int = 100


def make_optimizer(cfg: TrainerConfig):
    schedule = NAME2LR[cfg.lr_type](**cfg.lr_cfg)
    tx = optax.adam(schedule)
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx, schedule


def make_train_step(apply_fn: Callable, cfg: TrainerConfig, tx) -> Callable:
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    ``apply_fn(params, batch, rng)`` must return the renderer/depth output
    dict; losses come from the registry and are summed like the reference
    (every '*loss*' key, ``trainer.py:376-394``).
    """
    loss_fns = [(n, NAME2LOSS[n], cfg.loss_kwargs.get(n, {}))
                for n in cfg.losses]

    def loss_fn(params, batch, rng):
        out = apply_fn(params, batch, rng)
        terms = {}
        for name, fn, kw in loss_fns:
            terms.update(fn(out, batch, 0, **kw))
        loss = total_loss(terms)
        return loss, terms

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss}
        metrics.update({k: jnp.mean(v) for k, v in terms.items()})
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return train_step


class Trainer:
    """Minimal step-loop driver.

    :param apply_fn: (params, batch, rng) -> output dict.
    :param init_params: initial model params pytree.
    :param cfg: TrainerConfig.
    :param val_fn: optional (params, step) -> dict of scalar metrics.
    """

    def __init__(self, apply_fn: Callable, init_params: Any,
                 cfg: TrainerConfig, val_fn: Optional[Callable] = None,
                 log_fn: Optional[Callable] = None, mesh: Any = None,
                 variant_probs: Optional[Dict[str, float]] = None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a 'ray' axis —
        the trainer then replicates params/opt state across it and shards
        every per-ray batch array (tree key 'coords') on that axis; XLA
        inserts the gradient psum over ICI (SURVEY §2.8; the reference has
        nothing here — multi-GPU raises, ``train/trainer.py:233-236``).

        ``apply_fn`` may also be a dict ``{variant: fn}`` of apply
        functions sharing ONE param tree (e.g. the same renderer at
        several static sample counts): each variant gets its own jitted
        step and :meth:`fit` cycles through them at random (seeded from
        ``cfg.seed``; ``variant_probs`` weights the draw, default
        uniform).  This is the count-robust training recipe — sample
        counts are otherwise train-time knobs (an eval
        ``fine_depth_sample_num`` != the trained one collapses the sigma
        calibration; AB_QUALITY_r5.json ``serving_f48``)."""
        self.cfg = cfg
        self.apply_fn = apply_fn
        self.val_fn = val_fn
        self.log_fn = log_fn or (lambda step, m: None)
        self.mesh = mesh
        self.tx, self.schedule = make_optimizer(cfg)
        self.state = TrainState(step=jnp.zeros((), jnp.int32),
                                params=init_params,
                                opt_state=self.tx.init(init_params))
        if mesh is not None:
            from panogrf_tpu.parallel.sharded_train import replicate_tree
            self.state = replicate_tree(mesh, self.state)
        if isinstance(apply_fn, dict):
            self.train_steps = {k: make_train_step(fn, cfg, self.tx)
                                for k, fn in apply_fn.items()}
            self.train_step = next(iter(self.train_steps.values()))
            if variant_probs is not None:
                assert set(variant_probs) == set(apply_fn), \
                    (set(variant_probs), set(apply_fn))
        else:
            self.train_step = make_train_step(apply_fn, cfg, self.tx)
            self.train_steps = None
        self.variant_probs = variant_probs
        self.best_metric = -float("inf")
        self._ckpt_dir = Path(cfg.save_dir) / cfg.name

    # -- checkpointing (orbax) -------------------------------------------
    # Full training state is saved — params, opt_state, step AND the best
    # validation metric — matching the reference's resumable ``model.pth``
    # = {step, best_para, network_state_dict, optimizer_state_dict}
    # (reference ``train/trainer.py:438-459``).  Restoring continues the lr
    # schedule mid-decay because optax schedules read ``opt_state``'s count.

    def _ckpt_tree(self):
        return {"state": self.state,
                "best_metric": jnp.asarray(self.best_metric, jnp.float32)}

    def save(self, tag: str = "latest"):
        import orbax.checkpoint as ocp
        path = (self._ckpt_dir / tag).absolute()
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self._ckpt_tree(), force=True)
        ckptr.wait_until_finished()

    def restore(self, tag: str = "latest"):
        import orbax.checkpoint as ocp
        path = (self._ckpt_dir / tag).absolute()
        if not path.exists():
            raise FileNotFoundError(f"no checkpoint at {path}")
        ckptr = ocp.StandardCheckpointer()
        try:
            restored = ckptr.restore(path, self._ckpt_tree())
            self.state = restored["state"]
            self.best_metric = float(restored["best_metric"])
        except Exception as full_err:  # round-1 params-only checkpoints
            try:
                params = ckptr.restore(path, self.state.params)
            except Exception:
                # params-only fallback also failed: surface the ORIGINAL
                # full-state error, which names the real mismatch
                raise full_err
            self.state = self.state.replace(params=params)

    # -- loop --------------------------------------------------------------

    def fit(self, data_iter: Iterable, num_steps: Optional[int] = None,
            key_metric: str = "psnr_nr") -> Dict[str, float]:
        rng = jax.random.PRNGKey(self.cfg.seed)
        num_steps = num_steps or self.cfg.total_step
        last_metrics: Dict[str, float] = {}
        variant_keys = (sorted(self.train_steps) if self.train_steps
                        else None)
        if variant_keys:
            import numpy as _np
            variant_rng = _np.random.default_rng(self.cfg.seed)
            if self.variant_probs is not None:
                w = _np.asarray([self.variant_probs[k]
                                 for k in variant_keys], float)
                probs = w / w.sum()
            else:
                probs = None
        for i, batch in enumerate(data_iter):
            if i >= num_steps:
                break
            rng, sub = jax.random.split(rng)
            if self.mesh is not None:
                from panogrf_tpu.parallel.sharded_train import place_batch
                batch = place_batch(self.mesh, batch)
            step_fn = (self.train_steps[
                variant_keys[int(variant_rng.choice(len(variant_keys),
                                                    p=probs))]]
                if variant_keys else self.train_step)
            self.state, metrics = step_fn(self.state, batch, sub)
            step = int(self.state.step)
            if step % self.cfg.log_interval == 0 or i == 0:
                last_metrics = {k: float(v) for k, v in metrics.items()}
                self.log_fn(step, last_metrics)
            if self.val_fn and step % self.cfg.val_interval == 0:
                vm = self.val_fn(self.state.params, step)
                self.log_fn(step, vm)
                if vm.get(key_metric, -float("inf")) > self.best_metric:
                    self.best_metric = vm[key_metric]
                    self.save("best")
            if step % self.cfg.save_interval == 0:
                self.save("latest")
        return last_metrics


def load_checkpoint_params(path, target=None):
    """Load renderer params from any of our checkpoint layouts.

    Accepts the round-1 params-only checkpoints, the full trainer
    state ({"state": {params, opt_state, step}, "best_metric"}) written by
    :meth:`Trainer.save` — render/ft CLIs only need the params subtree —
    and a reference torch ``model.pth`` ({step, best_para,
    network_state_dict, optimizer_state_dict}, reference
    ``train/trainer.py:452-459``), converted through
    ``utils/torch_convert.convert_renderer``.

    :param target: optional params tree of matching structure.  Needed
        when restoring a checkpoint written under a different backend
        (orbax can only infer shardings for the backend that wrote it).
    """
    import orbax.checkpoint as ocp
    from pathlib import Path
    path = Path(path).absolute()
    if path.suffix in (".pt", ".pth", ".tar", ".ckpt"):
        import numpy as np
        import torch
        from panogrf_tpu.utils import torch_convert as tc
        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "network_state_dict" in raw:
            raw = raw["network_state_dict"]
        sd = {k: np.asarray(v) for k, v in raw.items()
              if hasattr(v, "shape")}
        return tc.convert_renderer(sd)
    try:
        raw = ocp.StandardCheckpointer().restore(
            path, *( [target] if target is not None else [] ))
    except Exception:
        try:
            raw = ocp.PyTreeCheckpointer().restore(str(path))
        except Exception:
            if target is None:
                raise
            # cross-backend restore without metadata shardings: read
            # raw arrays via the abstract target tree
            import jax
            import numpy as np
            abstract = jax.tree.map(
                lambda x: ocp.utils.to_shape_dtype_struct(x)
                if hasattr(ocp.utils, "to_shape_dtype_struct")
                else jax.ShapeDtypeStruct(np.shape(x), x.dtype), target)
            raw = ocp.StandardCheckpointer().restore(path, abstract)
    if isinstance(raw, dict) and "state" in raw:
        return raw["state"]["params"]
    return raw
