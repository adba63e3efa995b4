"""Data-parallel-over-rays training step on a device mesh.

Packaging of the pattern validated by ``__graft_entry__.dryrun_multichip``:
parameters and reference-view data replicated, the query ray axis sharded
on the mesh's 'ray' axis (and batch on 'data'), gradients all-reduced by
XLA automatically under jit with sharded inputs.  ICI carries the psum;
DCN would only appear for multi-slice data parallelism (SURVEY §2.8).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from panogrf_tpu.parallel.mesh import DATA_AXIS, RAY_AXIS
from panogrf_tpu.train.losses import NAME2LOSS, total_loss


def place_batch(mesh: Mesh, batch: dict) -> dict:
    """Shard per-ray arrays (anything under a 'coords' key) on the ray
    axis; replicate everything else."""
    ray = NamedSharding(mesh, P(None, RAY_AXIS))
    rep = NamedSharding(mesh, P())

    def place(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        return jax.device_put(leaf, ray if "coords" in keys else rep)

    return jax.tree_util.tree_map_with_path(place, batch)


def make_sharded_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                            mesh: Mesh, losses=("render",),
                            loss_kwargs: dict | None = None) -> Callable:
    """Build a jitted (params, opt_state, batch, rng) -> (params,
    opt_state, loss) step whose ray axis runs sharded across ``mesh``.

    ``apply_fn(params, batch, rng)`` returns the renderer output dict.
    Callers place params/opt_state with :func:`replicate_tree` and batches
    with :func:`place_batch`.
    """
    loss_fns = [(n, NAME2LOSS[n], (loss_kwargs or {}).get(n, {}))
                for n in losses]

    def loss_fn(params, batch, rng):
        out = apply_fn(params, batch, rng)
        terms = {}
        for _, fn, kw in loss_fns:
            terms.update(fn(out, batch, 0, **kw))
        return total_loss(terms)

    @jax.jit
    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.device_put(tree, rep)


def place_depth_batch(mesh: Mesh, batch: dict,
                      axis: str = DATA_AXIS) -> dict:
    """Shard every leaf of a depth batch along its leading (batch) dim on
    the mesh's ``axis``.  Leading dims must be divisible by the axis size.
    """
    shd = NamedSharding(mesh, P(axis))
    n = mesh.shape[axis]
    for path, leaf in jax.tree_util.tree_flatten_with_path(batch)[0]:
        if leaf.shape[0] % n:
            raise ValueError(
                f"batch leaf {path} has leading dim {leaf.shape[0]}, not "
                f"divisible by the {n}-way '{axis}' mesh axis — use a "
                f"batch size that is a multiple of the mesh size")
    return jax.tree.map(lambda x: jax.device_put(x, shd), batch)


def make_sharded_depth_step(forward_fn: Callable,
                            tx: optax.GradientTransformation, mesh: Mesh,
                            loss_type: str = "l1_sphere",
                            aux_d1_weight: float = 0.5,
                            axis: str = DATA_AXIS) -> Callable:
    """Data-parallel depth-net train step over the mesh's ``axis`` with
    cross-replica BatchNorm (the reference's SyncBN role,
    ``/root/reference/sync_batchnorm/batchnorm.py``; SURVEY §2.2).

    Runs per-replica via ``shard_map`` so the model's named ``bn_axis``
    exists: build the net with ``bn_axis=axis`` (e.g.
    ``MVSDepthModel(bn_axis='data')``) and BatchNorm pmean-reduces its
    batch statistics across replicas — training numerics match one big
    device seeing the global batch.  Gradients/loss are pmean'd here; the
    updated ``batch_stats`` come back synced (replicated) by construction.

    :param forward_fn: ``(variables, batch, train) -> (outputs,
        mutated_state)`` — same contract as
        :class:`panogrf_tpu.train.depth_trainer.DepthTrainer`.
    :return: jitted ``(params, state, opt_state, batch) -> (params, state,
        opt_state, loss)``; batch leaves must have their leading (batch)
        dim divisible by the mesh ``axis`` size.
    """
    from panogrf_tpu.train.depth_trainer import depth_loss_fn

    def loss_fn(params, state, batch):
        out, new_state = forward_fn({"params": params, **state}, batch,
                                    True)
        gt = batch["gt_depth"]
        mask = batch.get("gt_mask")
        sigma = out["pred"][..., 1:] if "pred" in out else None
        pred = (out["pred"][..., :1] if "pred" in out
                else out["pred_depth"])
        loss = depth_loss_fn(loss_type, pred, gt, mask, sigma)
        if "rectified_depth_d1" in out:
            loss = loss + aux_d1_weight * depth_loss_fn(
                "l1_sphere", out["rectified_depth_d1"], gt, mask)
        return loss, new_state or state

    def _step(params, state, opt_state, batch):
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    rep = P()
    shd = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(rep, rep, rep, P(axis)),
        out_specs=(rep, rep, rep, rep),
        check_vma=False)  # BN's pmean makes state replicated; tx updates
    #                       from pmean'd grads keep params replicated —
    #                       the static checker can't see through optax.
    return jax.jit(shd)
