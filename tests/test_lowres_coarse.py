"""Low-res coarse importance pass (full_render coarse_lowres).

Serving-only two-stage render: coarse hit-prob on an (H/f, W/f) ray grid,
bilinearly upsampled to drive the full-res fine pass.  Valid because the
deterministic stratified depth ticks are identical for every ray (see
NeuralRayGenRenderer.coarse_hit_probs; no reference analogue — its coarse
pass always runs per output ray, network/renderer.py:567-633).
"""

import jax
import jax.numpy as jnp
import numpy as np

from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
from panogrf_tpu.renderer import full_render


def _scene(H, W, DH, DW, seed=7):
    rng = np.random.default_rng(seed)
    w2c = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1), (2, 3, 4))
    ref_info = {
        "imgs": jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32),
        "mvs_depth": jnp.asarray(rng.uniform(1, 5, size=(2, DH, DW, 1)),
                                 jnp.float32),
        "depth_range": jnp.asarray([[0.5, 15.0]] * 2),
        "w2c": w2c.at[1, 2, 3].set(0.5),
    }
    c2w = jnp.concatenate([jnp.eye(3), jnp.asarray([[.1], [0.], [.2]])], 1)
    return ref_info, c2w


def test_lowres_coarse_f1_matches_standard():
    """The two-stage path at f=1 computes the same function as the
    standard hierarchical render (same coarse hit-prob, identity
    upsample, same fine sampling) — equal up to XLA fusion-boundary
    float noise (the coarse pass compiles as its own lax.map)."""
    H, W, DH, DW = 32, 64, 16, 32
    ref_info, c2w = _scene(H, W, DH, DW)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8,
                                 fine_depth_sample_num=8, fast_gather=True)
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {
                "coords": jnp.zeros((1, 8, 2)), "c2w": c2w,
                "depth_range": jnp.asarray([[0.5, 15.0]])}}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    ref_data = full_render.prepare_ref_data(model, params, ref_info)
    qdr = jnp.asarray([[0.5, 15.0]])
    a = full_render.render_image_device(model, params, ref_data, c2w, qdr,
                                        ref_info["depth_range"], chunk=128)
    b = full_render.render_image_device(model, params, ref_data, c2w, qdr,
                                        ref_info["depth_range"], chunk=128,
                                        mode="lowres_test", coarse_lowres=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_lowres_coarse_f2_close():
    """f=2: runs, finite, and close to the standard render — only WHERE
    the fine samples land changes, and the fine pass re-integrates."""
    H, W, DH, DW = 32, 64, 16, 32
    ref_info, c2w = _scene(H, W, DH, DW)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8,
                                 fine_depth_sample_num=8, fast_gather=True)
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {
                "coords": jnp.zeros((1, 8, 2)), "c2w": c2w,
                "depth_range": jnp.asarray([[0.5, 15.0]])}}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    ref_data = full_render.prepare_ref_data(model, params, ref_info)
    qdr = jnp.asarray([[0.5, 15.0]])
    a = np.asarray(full_render.render_image_device(
        model, params, ref_data, c2w, qdr, ref_info["depth_range"],
        chunk=128))
    b = np.asarray(full_render.render_image_device(
        model, params, ref_data, c2w, qdr, ref_info["depth_range"],
        chunk=128, coarse_lowres=2))
    assert np.isfinite(b).all()
    assert np.abs(a - b).mean() < 0.05, np.abs(a - b).mean()


def test_coarse_chunk_is_pure_blocking():
    """coarse_chunk only re-blocks the lowres coarse lax.map: any value
    gives the same image as the default (coarse pass re-batched for its
    latency-bound agg matmuls; fine pass untouched)."""
    H, W, DH, DW = 32, 64, 16, 32
    ref_info, c2w = _scene(H, W, DH, DW)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8,
                                 fine_depth_sample_num=8, fast_gather=True)
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {
                "coords": jnp.zeros((1, 8, 2)), "c2w": c2w,
                "depth_range": jnp.asarray([[0.5, 15.0]])}}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    ref_data = full_render.prepare_ref_data(model, params, ref_info)
    qdr = jnp.asarray([[0.5, 15.0]])
    kw = dict(chunk=64, coarse_lowres=2)
    a = full_render.render_image_device(model, params, ref_data, c2w, qdr,
                                        ref_info["depth_range"], **kw)
    b = full_render.render_image_device(model, params, ref_data, c2w, qdr,
                                        ref_info["depth_range"],
                                        coarse_chunk=256, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_video_batch_matches_per_frame():
    """render_video_device: B pose-batched frames == the per-frame
    render_image_device outputs, at f=1 and at the serving f=2 path
    (vmap over the pose axis is pure batching, not an approximation)."""
    H, W, DH, DW = 32, 64, 16, 32
    ref_info, c2w = _scene(H, W, DH, DW)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8,
                                 fine_depth_sample_num=8, fast_gather=True)
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {
                "coords": jnp.zeros((1, 8, 2)), "c2w": c2w,
                "depth_range": jnp.asarray([[0.5, 15.0]])}}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    ref_data = full_render.prepare_ref_data(model, params, ref_info)
    qdr = jnp.asarray([[0.5, 15.0]])
    c2w2 = c2w.at[2, 3].add(0.3)
    c2ws = jnp.stack([c2w, c2w2])
    for f in (1, 2):
        vid = np.asarray(full_render.render_video_device(
            model, params, ref_data, c2ws, qdr, ref_info["depth_range"],
            chunk=128, coarse_lowres=f))
        assert vid.shape == (2, H, W, 3)
        for i, cw in enumerate((c2w, c2w2)):
            one = np.asarray(full_render.render_image_device(
                model, params, ref_data, cw, qdr, ref_info["depth_range"],
                chunk=128, coarse_lowres=f))
            np.testing.assert_allclose(vid[i], one, rtol=2e-4, atol=2e-5)
