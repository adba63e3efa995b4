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

from panogrf_tpu.parallel.mesh import RAY_AXIS
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
