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
