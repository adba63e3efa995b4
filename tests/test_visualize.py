"""Training-time visual observability (utils/visualize.py) — VERDICT r4
missing #1: gt|pred side-by-sides + turbo depth/error sheets written
under the run dir (reference VisualizeImage network/metrics.py:287-361,
train_depth.py:456-580 tensorboard images)."""

import numpy as np

from panogrf_tpu.utils import visualize as V


def test_turbo_colormap_shape_and_anchors():
    x = np.linspace(0, 1, 5)
    rgb = V.turbo_colormap(x)
    assert rgb.shape == (5, 3)
    assert np.isfinite(rgb).all() and (rgb >= 0).all() and (rgb <= 1).all()
    # turbo runs blue -> red: low end blue-dominant, high end red-dominant
    assert rgb[0, 2] > rgb[0, 0]
    assert rgb[-1, 0] > rgb[-1, 2]
    # out-of-range input clips, no NaNs
    r2 = V.turbo_colormap(np.asarray([-1.0, 2.0]))
    assert np.isfinite(r2).all()


def test_depth_and_error_maps():
    rng = np.random.default_rng(0)
    d = rng.uniform(1, 8, size=(16, 32, 1)).astype(np.float32)
    img = V.depth_turbo(d)
    assert img.shape == (16, 32, 3)
    err = V.error_turbo(d, d + 0.1)
    assert err.shape == (16, 32, 3)
    # constant depth (zero dynamic range) must not divide by zero
    flat = V.depth_turbo(np.full((4, 8), 3.0))
    assert np.isfinite(flat).all()


def test_hstack_pads_and_separates():
    a = np.zeros((8, 10, 3), np.float32)
    b = np.ones((6, 4, 3), np.float32)
    out = V.hstack_images(a, b, pad=2)
    assert out.shape == (8, 10 + 2 + 4, 3)
    # separator column is white
    assert (out[:, 10:12] == 1.0).all()


def test_dump_render_and_depth_val(tmp_path):
    rng = np.random.default_rng(1)
    gt = rng.uniform(size=(8, 16, 3)).astype(np.float32)
    pred = rng.uniform(size=(8, 16, 3)).astype(np.float32)
    depth = rng.uniform(1, 5, size=(8, 16)).astype(np.float32)
    files = V.dump_render_val(tmp_path / "vis", 120, 0, gt, pred,
                              pred_depth=depth)
    assert len(files) == 2 and all(f.exists() for f in files)
    f = V.dump_depth_val(tmp_path / "vis", 120, 1, gt, depth[..., None],
                         depth[..., None] * 1.1, d_max=5.0)
    assert f.exists()
    names = {p.name for p in (tmp_path / "vis").iterdir()}
    assert "step000120-0-gt_pred.png" in names or \
        "step000120-0-gt_pred.npy" in names


def test_depth_trainer_vis_interval(tmp_path):
    """DepthTrainer writes a turbo sheet every cfg.vis_interval steps."""
    import jax
    import jax.numpy as jnp
    from panogrf_tpu.models.unifuse import EquiDepth
    from panogrf_tpu.train.depth_trainer import (DepthTrainer,
                                                 DepthTrainConfig)

    model = EquiDepth(max_depth=10.0, wrap=True, num_layers=18)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 32, 64, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(1, 5, size=(1, 32, 64, 1)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def forward_fn(v, batch, train):
        out, mut = model.apply(v, batch["pano"], train,
                               mutable=["batch_stats"] if train else [])
        return out, (dict(mut) if train else {})

    cfg = DepthTrainConfig(name="visrun", save_dir=str(tmp_path),
                           vis_interval=2, log_interval=100,
                           checkpoint_interval=10**9)
    tr = DepthTrainer(forward_fn, variables, cfg)

    def batches():
        while True:
            yield {"pano": x, "gt_depth": gt}

    tr.fit(batches(), 2)
    vis = list((tmp_path / "visrun" / "vis").iterdir())
    assert vis, "no vis sheet written at step 2"
