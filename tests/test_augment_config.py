"""Augmentation consistency + config loader tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.config import load_config
from panogrf_tpu.core import sphere
from panogrf_tpu.data import augment, imgs_info
from panogrf_tpu.data.synthetic import SphereScene, make_three_view_sample


def test_yaw_roll_keeps_photoconsistency():
    """After yaw-roll, re-projecting with the rotated poses still lands on
    the same scene content (GT-depth warp check)."""
    H, W = 64, 128
    conv = sphere.M3D
    s = make_three_view_sample(SphereScene.random(3), H, W, 0.3, seed=7)
    s = {k: jnp.asarray(v) for k, v in s.items()}
    rolled = augment.yaw_roll(s, 24)

    from panogrf_tpu.ops.resample import bilinear_sample
    w2c = imgs_info.pose_w2c(rolled["rots"], rolled["trans"])
    c2w = imgs_info.c2w_from_w2c(w2c)
    dirs = conv.ray_directions(H, W)
    d1 = rolled["depth_panos"][1][..., 0]
    pts_w = c2w[1, :, 3] + jnp.einsum(
        "ij,hwj->hwi", c2w[1, :, :3], dirs) * d1[..., None]
    cam0 = jnp.einsum("ij,hwj->hwi", w2c[0, :, :3], pts_w) + w2c[0, :, 3]
    xy0, dist0 = conv.project_to_pixels(cam0, H, W)
    warped = bilinear_sample(rolled["rgb_panos"][0], xy0)
    d0_at = bilinear_sample(rolled["depth_panos"][0], xy0)[..., 0]
    visible = np.asarray(jnp.abs(d0_at - dist0) < 0.05)[4:-4]
    err = np.abs(np.asarray(warped - rolled["rgb_panos"][1]))[4:-4]
    mean_err = (err.mean(-1) * visible).sum() / visible.sum()
    assert mean_err < 0.04, mean_err


def test_photometric_jitter_bounds():
    s = {"rgb_panos": jnp.full((3, 8, 16, 3), 0.5)}
    out = augment.photometric_jitter(s, jax.random.PRNGKey(0))
    arr = np.asarray(out["rgb_panos"])
    assert (arr >= 0).all() and (arr <= 1).all()
    assert not np.allclose(arr, 0.5)


def test_config_loader_reference_yaml(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text("""
height: 512
width: 1024
depth_height: 256
depth_width: 512
min_depth: 0.5
max_depth: 15.0
mvs_min_depth: 0.1
mvs_max_depth: 10
MAGNET_num_samples: 5
MAGNET_sampling_range: 3
mono_net: "UniFuse"
use_hierarchical_sampling: true
ray_batch_num: 2048
lr_cfg:
  lr_init: 4.0e-4
  decay_step: 20000
  decay_rate: 0.5
loss: [render, depth]
total_step: 100000
name: test_run
unknown_key_is_ignored: true
""")
    cfg = load_config(y)
    assert cfg.renderer.height == 512
    assert cfg.mvs.depth_height == 256
    assert cfg.mvs.magnet_num_samples == 5
    assert cfg.mono.mono_net == "UniFuse"
    assert cfg.train.lr_init == 4e-4
    assert cfg.train.loss == ("render", "depth")
    assert cfg.train.name == "test_run"
