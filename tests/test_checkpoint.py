"""Trainer orbax checkpoint save/restore round trip."""

import numpy as np
import jax
import jax.numpy as jnp


def test_trainer_save_restore(tmp_path):
    import optax
    from panogrf_tpu.train.trainer import Trainer, TrainerConfig

    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(4, 4)),
                               jnp.float32)}

    def apply_fn(p, batch, rng):
        out = batch["x"] @ p["w"]
        return {"pixel_colors_nr": out[None],
                "pixel_colors_gt": jnp.zeros_like(out)[None],
                "ray_mask": jnp.ones((1, out.shape[0]), bool)}

    cfg = TrainerConfig(name="ck", save_dir=str(tmp_path), losses=("render",),
                        total_step=3, log_interval=1,
                        val_interval=10**9, save_interval=10**9)
    tr = Trainer(apply_fn, params, cfg)
    batch = {"x": jnp.ones((5, 4))}
    tr.fit([batch] * 3)
    trained = jax.tree.map(np.asarray, tr.state.params)
    tr.save("latest")

    tr2 = Trainer(apply_fn, params, cfg)
    tr2.restore("latest")
    restored = jax.tree.map(np.asarray, tr2.state.params)
    np.testing.assert_allclose(restored["w"], trained["w"])
    assert not np.allclose(restored["w"], np.asarray(params["w"]))


def test_trainer_resume_continues_step_optstate_and_lr(tmp_path):
    """Kill/resume parity (reference ``train/trainer.py:438-459``): step,
    optimizer state and best metric survive, so the lr schedule continues
    mid-decay instead of restarting at step 0."""
    import optax
    from panogrf_tpu.train.trainer import Trainer, TrainerConfig

    params = {"w": jnp.ones((4, 4), jnp.float32)}

    def apply_fn(p, batch, rng):
        out = batch["x"] @ p["w"]
        return {"pixel_colors_nr": out[None],
                "pixel_colors_gt": jnp.zeros_like(out)[None],
                "ray_mask": jnp.ones((1, out.shape[0]), bool)}

    cfg = TrainerConfig(name="rs", save_dir=str(tmp_path), losses=("render",),
                        lr_cfg={"lr_init": 1e-3, "decay_step": 4,
                                "decay_rate": 0.5},
                        total_step=6, log_interval=1,
                        val_interval=10**9, save_interval=10**9)
    batch = {"x": jnp.ones((5, 4))}

    # uninterrupted 6-step run
    tr_full = Trainer(apply_fn, params, cfg)
    tr_full.fit([batch] * 6)

    # killed after 3 steps, resumed for 3 more
    tr = Trainer(apply_fn, params, cfg)
    tr.fit([batch] * 3)
    tr.best_metric = 12.5
    tr.save("latest")
    tr2 = Trainer(apply_fn, params, cfg)
    tr2.restore("latest")
    assert int(tr2.state.step) == 3
    assert tr2.best_metric == 12.5
    # optimizer state (adam moments + schedule count) restored exactly
    for a, b in zip(jax.tree.leaves(tr.state.opt_state),
                    jax.tree.leaves(tr2.state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    tr2.fit([batch] * 3)

    assert int(tr2.state.step) == 6
    np.testing.assert_allclose(
        np.asarray(tr2.state.params["w"]),
        np.asarray(tr_full.state.params["w"]), rtol=1e-5)


def test_depth_trainer_rolling_checkpoints(tmp_path):
    from panogrf_tpu.train.depth_trainer import (DepthTrainer,
                                                 DepthTrainConfig)
    params = {"w": jnp.ones((2, 2))}

    def forward_fn(variables, batch, train):
        d = jnp.ones((1, 8, 16, 1)) * variables["params"]["w"][0, 0]
        return {"pred_depth": d}, {}

    cfg = DepthTrainConfig(name="dck", save_dir=str(tmp_path),
                           checkpoint_interval=1, checkpoint_count=2,
                           log_interval=10)
    tr = DepthTrainer(forward_fn, {"params": params}, cfg)
    batch = {"gt_depth": jnp.full((1, 8, 16, 1), 2.0)}
    tr.fit([batch] * 4, 4)
    kept = sorted((tmp_path / "dck").glob("checkpoint_*"))
    assert len(kept) == 2  # rolling window
    assert tr.restore()
    assert tr.step == 4


def test_standard_checkpointer_roundtrip_bitexact(tmp_path):
    """Params saved via ocp.StandardCheckpointer (the ab_quality
    --save-ckpt path) restore BIT-EXACT through load_checkpoint_params
    — guards the save/restore integrity of every eval comparison."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    from panogrf_tpu.train.trainer import load_checkpoint_params

    rng = np.random.default_rng(0)
    params = {"params": {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(7, 13)),
                                        jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(13,)),
                                      jnp.float32)},
        "nested": {"w": jnp.asarray(rng.normal(size=(3, 5, 2)),
                                    jnp.float32)}}}
    path = tmp_path / "ckpt"
    ck = ocp.StandardCheckpointer()
    ck.save(path.absolute(), params, force=True)
    ck.wait_until_finished()  # save is async (tools/ab_quality.py bug)
    restored = load_checkpoint_params(path)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(restored))
    assert len(flat_a) == len(flat_b)
    for key, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[key]))
