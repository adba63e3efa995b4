"""Depth-network training loops (mono UniFuse finetune + 360-MVS).

Reference ``train_mono.py:64-1180`` and ``train_depth.py:23-1199`` (the
``App`` pattern): step loop with Adam, rolling checkpoints, sin-weighted
losses, periodic ERP depth metrics.  Here both recipes share one functional
trainer that handles BatchNorm state (`batch_stats`) explicitly.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from panogrf_tpu.train import losses as L
from panogrf_tpu.train import metrics as M

Array = jax.Array


@dataclasses.dataclass
class DepthTrainConfig:
    name: str = "depth_run"
    total_iter: int = 100000
    learning_rate: float = 1e-4
    opt_beta1: float = 0.9
    opt_beta2: float = 0.999
    clip_grad_value: Optional[float] = 1.0
    loss_type: str = "l1_sphere"       # l1_sphere | berhu | gaussian_nll
    aux_d1_weight: float = 0.5         # train_depth.py:390-410 (0.5 * d1)
    checkpoint_interval: int = 10000
    checkpoint_count: int = 3
    save_dir: str = "data/depth_model"
    log_interval: int = 100
    vis_interval: int = 0      # >0: turbo depth/error PNGs every N steps
    seed: int = 2022


def depth_loss_fn(loss_type: str, pred: Array, gt: Array,
                  mask: Array | None = None,
                  sigma: Array | None = None) -> Array:
    if loss_type == "l1_sphere":
        return L.l1_sphere_loss(pred, gt, mask)
    if loss_type == "berhu":
        return L.berhu_loss(pred, gt, mask)
    if loss_type == "gaussian_nll":
        assert sigma is not None
        return L.gaussian_nll_loss(pred, sigma, gt, mask)
    raise ValueError(loss_type)


class DepthTrainer:
    """Shared step-loop for mono / MVS depth nets.

    :param forward_fn: (variables, batch, train) ->
        (outputs dict, mutated_state) where outputs contains ``pred_depth``
        (B, H, W, 1), optional ``pred`` (mu, sigma) and optional
        ``rectified_depth_d1``; ``batch["gt_depth"]`` supervises.
    """

    def __init__(self, forward_fn: Callable, variables: Any,
                 cfg: DepthTrainConfig,
                 log_fn: Optional[Callable] = None, mesh=None):
        """:param mesh: optional ``jax.sharding.Mesh`` — train data-parallel
        over its 'data' axis with cross-replica BatchNorm (build the net
        with ``bn_axis='data'``); SURVEY §2.8 DP, reference SyncBN role.
        """
        self.cfg = cfg
        self.forward_fn = forward_fn
        self.log_fn = log_fn or (lambda s, m: None)
        self.mesh = mesh
        self.params = variables.get("params", variables)
        self.state = {k: v for k, v in variables.items() if k != "params"}
        tx = optax.adam(cfg.learning_rate, b1=cfg.opt_beta1,
                        b2=cfg.opt_beta2)
        if cfg.clip_grad_value:
            tx = optax.chain(
                optax.clip(cfg.clip_grad_value), tx)
        self.tx = tx
        self.opt_state = tx.init(self.params)
        self.step = 0
        self._build_step()
        if mesh is not None:
            self._replicate()

    def _replicate(self):
        from panogrf_tpu.parallel.sharded_train import replicate_tree
        self.params = replicate_tree(self.mesh, self.params)
        self.state = replicate_tree(self.mesh, self.state)
        self.opt_state = replicate_tree(self.mesh, self.opt_state)

    def _build_step(self):
        cfg = self.cfg
        if self.mesh is not None:
            from panogrf_tpu.parallel.sharded_train import \
                make_sharded_depth_step
            self._train_step = make_sharded_depth_step(
                self.forward_fn, self.tx, self.mesh,
                loss_type=cfg.loss_type, aux_d1_weight=cfg.aux_d1_weight)
            return

        def loss_fn(params, state, batch):
            variables = {"params": params, **state}
            out, new_state = self.forward_fn(variables, batch, True)
            gt = batch["gt_depth"]
            mask = batch.get("gt_mask")
            sigma = out["pred"][..., 1:] if "pred" in out else None
            pred = (out["pred"][..., :1] if "pred" in out
                    else out["pred_depth"])
            loss = depth_loss_fn(cfg.loss_type, pred, gt, mask, sigma)
            if "rectified_depth_d1" in out:
                loss = loss + cfg.aux_d1_weight * depth_loss_fn(
                    "l1_sphere", out["rectified_depth_d1"], gt, mask)
            # A forward that mutates nothing returns {} — keep prior state
            # (dropping it would erase batch_stats for eval-mode nets).
            if not new_state:
                new_state = state
            return loss, new_state

        @jax.jit
        def train_step(params, state, opt_state, batch):
            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_state, opt_state, loss

        self._train_step = train_step

    def fit(self, data_iter: Iterable, num_steps: Optional[int] = None):
        num_steps = num_steps or self.cfg.total_iter
        t0 = time.time()
        last = {}
        for i, batch in enumerate(data_iter):
            if i >= num_steps:
                break
            if self.mesh is not None:
                from panogrf_tpu.parallel.sharded_train import \
                    place_depth_batch
                batch = place_depth_batch(self.mesh, batch)
            self.params, self.state, self.opt_state, loss = \
                self._train_step(self.params, self.state, self.opt_state,
                                 batch)
            self.step += 1
            if self.step % self.cfg.log_interval == 0 or i == 0:
                last = {"loss": float(loss),
                        "sec": round(time.time() - t0, 1)}
                self.log_fn(self.step, last)
            if self.cfg.vis_interval and \
                    self.step % self.cfg.vis_interval == 0:
                self.dump_vis(batch)
            if self.step % self.cfg.checkpoint_interval == 0:
                self.save()
        return last

    def dump_vis(self, batch) -> None:
        """Write a ``[rgb |] gt | pred | error`` turbo sheet for the first
        sample of ``batch`` under ``{save_dir}/{name}/vis/`` (reference
        tensorboard depth/error images, ``train_depth.py:456-580``)."""
        import numpy as np
        from panogrf_tpu.utils import visualize as V
        variables = {"params": self.params, **self.state}
        out, _ = self.forward_fn(variables, batch, False)
        pred = (out["pred"][..., :1] if "pred" in out
                else out["pred_depth"])
        rgb = None
        if "panos" in batch:          # MVS batch: reference view = index 1
            rgb = np.asarray(batch["panos"][0, 1])
        elif "equi" in batch:         # mono batch (imagenet-normalized)
            from panogrf_tpu.models.unifuse import IMAGENET_MEAN, \
                IMAGENET_STD
            rgb = np.clip(np.asarray(batch["equi"][0])
                          * np.asarray(IMAGENET_STD)
                          + np.asarray(IMAGENET_MEAN), 0, 1)
        V.dump_depth_val(
            Path(self.cfg.save_dir) / self.cfg.name / "vis", self.step, 0,
            rgb, np.asarray(batch["gt_depth"][0]), np.asarray(pred[0]))

    # rolling checkpoints (reference helpers/torch_checkpoint_manager.py)
    def save(self):
        import orbax.checkpoint as ocp
        root = Path(self.cfg.save_dir) / self.cfg.name
        path = (root / f"checkpoint_{self.step}").absolute()
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": self.params, **self.state}, force=True)
        ckptr.wait_until_finished()
        kept = sorted(root.glob("checkpoint_*"),
                      key=lambda p: int(p.name.split("_")[1]))
        for old in kept[:-self.cfg.checkpoint_count]:
            import shutil
            shutil.rmtree(old, ignore_errors=True)

    def latest_checkpoint(self) -> Optional[Path]:
        root = Path(self.cfg.save_dir) / self.cfg.name
        cks = sorted(root.glob("checkpoint_*"),
                     key=lambda p: int(p.name.split("_")[1]))
        return cks[-1] if cks else None

    def restore(self):
        import orbax.checkpoint as ocp
        path = self.latest_checkpoint()
        if path is None:
            return False
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path.absolute(),
                                 {"params": self.params, **self.state})
        self.params = restored["params"]
        self.state = {k: v for k, v in restored.items() if k != "params"}
        self.step = int(path.name.split("_")[1])
        if self.mesh is not None:
            self._replicate()
        return True

    def evaluate(self, batches: Iterable, max_batches: int = 8) -> Dict:
        """sin-weighted ERP depth metrics (reference train_depth.py:995)."""
        agg: Dict[str, list] = {}
        for i, batch in enumerate(batches):
            if i >= max_batches:
                break
            variables = {"params": self.params, **self.state}
            out, _ = self.forward_fn(variables, batch, False)
            pred = (out["pred"][..., :1] if "pred" in out
                    else out["pred_depth"])
            for b in range(pred.shape[0]):
                m = M.depth_metrics_erp(pred[b], batch["gt_depth"][b])
                for k, v in m.items():
                    agg.setdefault(k, []).append(float(v))
        return {k: sum(v) / len(v) for k, v in agg.items()}
