"""Full-image rendering: chunked, jitted, optionally mesh-sharded.

Replaces the reference's serial ray-batch Python loop
(``network/renderer.py:647-686``, ``render.py:249-304``): reference-view
encoding runs once per scene; ray chunks are rendered by ONE compiled
function (same shape every call), and on a multi-chip mesh the ray axis is
sharded so each chip renders a slice of the pano (SURVEY §5.7).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer

Array = jax.Array


def prepare_ref_data(model: NeuralRayGenRenderer, params: Any,
                     ref_info: dict) -> dict:
    """Encode reference views once per scene (jitted)."""
    @jax.jit
    def _prep(params, imgs, depth):
        return model.apply(params, imgs, depth,
                           method=NeuralRayGenRenderer.prepare_ref)
    ref_data = _prep(params, ref_info["imgs"], ref_info["mvs_depth"])
    ref_data["w2c"] = ref_info["w2c"]
    return ref_data


@functools.partial(jax.jit, static_argnums=(0,))
def _render_chunk(model: NeuralRayGenRenderer, params, ref_data, coords,
                  que_c2w, que_depth_range, ref_depth_range):
    out = model.apply(params, ref_data, coords, que_c2w, que_depth_range,
                      ref_depth_range,
                      method=NeuralRayGenRenderer.render_rays)
    keys = ["pixel_colors_nr_fine" if "pixel_colors_nr_fine" in out
            else "pixel_colors_nr"]
    if "render_depth_fine" in out:
        keys.append("render_depth_fine")
    return {k: out[k] for k in keys}


def render_image_device(model: NeuralRayGenRenderer, params: Any,
                        ref_data: dict, que_c2w: Array,
                        que_depth_range: Array, ref_depth_range: Array,
                        chunk: int = 8192, mode: str = "hierarchical",
                        n_candidates: int = 128, n_uniform: int = 0,
                        contain_uniform: int = 0,
                        coarse_lowres: int = 1,
                        coarse_chunk: int = 0) -> Array:
    """Whole-pano render as ONE jitted computation.

    The chunk loop runs on-device via ``lax.map`` (compiles the chunk body
    once), eliminating per-chunk host dispatch entirely — the right shape
    for TPU serving and for honest benchmarking through the tunnel.

    :param mode: 'hierarchical' (coarse+fine, the headline protocol) or
        'diner' (occlusion-aware depth-guided sampling, the reference's
        own low-sample operating point — needs ``mvs_depth`` and
        ``mvs_uncert`` in ``ref_data``).
    :param coarse_lowres: f > 1 runs the COARSE importance pass on an
        (H/f, W/f) ray grid and bilinearly upsamples its hit-prob CDF to
        drive the full-res fine pass (serving only; valid because the
        deterministic stratified depth ticks are identical for every
        ray — see ``NeuralRayGenRenderer.coarse_hit_probs``).  Coarse
        cost (gather + aggregation + projection) drops by ~f²: measured
        1237 → 717 ms/frame at f=2 and 577 ms at f=4 (512x1024, v5e);
        trained-ckpt A/B AB_QUALITY_r5.json ``clr2`` +0.05 dB / ``clr4``
        +0.09 dB vs the non-lowres serving point.  The presets ship
        f=2 (serving) / f=4 (turbo), ``presets.PRESET_COARSE_LOWRES``.
        f == 1 through this path is bit-exact to the standard
        hierarchical render (regression-tested).
    :param coarse_chunk: ray-chunk size for the LOW-RES coarse pass only
        (0 = same as ``chunk``).  Chunking is pure blocking (bit-exact);
        the lowres grid has 1/f² the rays, so a larger coarse chunk
        re-batches its latency-bound agg matmuls without moving the
        fine pass off its swept optimum (sweep via
        ``bench.py --coarse-chunk``).  Measured on the v5e serving
        point: a NO-OP to a loss (512 → 692 ms = the chunk-256
        baseline, 4096 → 769 ms; 1024/2048 hit >9-min XLA compiles) —
        the coarse share at f=2 is too small for re-batching to pay, so
        the presets keep 0.
    :return: rgb (H, W, 3) on device.
    """
    h, w = model.height, model.width
    n = h * w
    assert n % chunk == 0, (n, chunk)

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    coords = jnp.asarray(
        np.stack([xs, ys], -1).reshape(n // chunk, 1, chunk, 2), jnp.float32)

    if coarse_lowres > 1 or (coarse_lowres == 1 and mode == "lowres_test"):
        assert mode in ("hierarchical", "lowres_test") and \
            model.use_hierarchical_sampling and not model.light_coarse
        f = coarse_lowres
        assert h % f == 0 and w % f == 0, (h, w, f)
        lh, lw = h // f, w // f
        nlr = lh * lw
        lchunk = min(coarse_chunk or chunk, nlr)
        assert nlr % lchunk == 0, (nlr, lchunk)
        # low-res rays sample the CENTER pixel of each f x f cell
        lxs, lys = np.meshgrid(np.arange(lw) * f + f // 2,
                               np.arange(lh) * f + f // 2)
        lcoords = jnp.asarray(
            np.stack([lxs, lys], -1).reshape(nlr // lchunk, 1, lchunk, 2),
            jnp.float32)

        def coarse_chunk(c):
            return model.apply(
                params, ref_data, c, que_c2w, que_depth_range,
                ref_depth_range,
                method=NeuralRayGenRenderer.coarse_hit_probs)[0]

        hit = jax.lax.map(coarse_chunk, lcoords)     # (nc, lchunk, dn)
        dn = hit.shape[-1]
        from panogrf_tpu.nn.blocks import resize_linear
        hit_full = resize_linear(hit.reshape(lh, lw, dn), (h, w),
                                 axes=(0, 1))
        hit_full = hit_full.reshape(n // chunk, 1, chunk, dn)

        def fine_chunk(args):
            c, hp = args
            out = model.apply(
                params, ref_data, c, hp, que_c2w, que_depth_range,
                ref_depth_range,
                method=NeuralRayGenRenderer.render_fine_from_hit)
            return out["pixel_colors_nr_fine"][0]

        rgb = jax.lax.map(fine_chunk, (coords, hit_full))
        return jnp.clip(rgb.reshape(h, w, 3), 0.0, 1.0)

    def render_chunk(c):
        if mode == "diner":
            out = model.apply(params, ref_data, c, que_c2w,
                              que_depth_range, ref_depth_range,
                              n_candidates=n_candidates,
                              n_uniform=n_uniform,
                              contain_uniform=contain_uniform,
                              method=NeuralRayGenRenderer.render_rays_diner)
        else:
            out = model.apply(params, ref_data, c, que_c2w,
                              que_depth_range, ref_depth_range,
                              method=NeuralRayGenRenderer.render_rays)
        key = ("pixel_colors_nr_fine" if "pixel_colors_nr_fine" in out
               else "pixel_colors_nr")
        return out[key][0]

    rgb = jax.lax.map(render_chunk, coords)
    return jnp.clip(rgb.reshape(h, w, 3), 0.0, 1.0)


def render_video_device(model: NeuralRayGenRenderer, params: Any,
                        ref_data: dict, c2ws: Array,
                        que_depth_range: Array, ref_depth_range: Array,
                        chunk: int = 256, coarse_lowres: int = 1,
                        coarse_chunk: int = 0) -> Array:
    """Render B frames of a pose path as ONE jitted computation.

    The per-pose chunk body is ``jax.vmap``-ed over the pose axis inside
    the same ``lax.map`` chunk loop as :func:`render_image_device`, so
    the latency-bound aggregation matmuls run at B× the row count per
    dispatch while reference data (merged maps) is shared — the natural
    serving shape for the pose-path/video protocol (reference
    ``render.py:304,401`` renders the 'inter' frames one by one through
    its serial ray-batch loop).  Per-frame output is bit-exact to
    :func:`render_image_device` at the same flags (vmap is a batching
    transform, not an approximation; regression-tested).

    :param c2ws: (B, 3, 4) camera-to-world poses.
    :return: rgb (B, H, W, 3) on device.
    """
    h, w = model.height, model.width
    n = h * w
    assert c2ws.ndim == 3 and c2ws.shape[1:] == (3, 4), c2ws.shape
    assert n % chunk == 0, (n, chunk)

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    coords = jnp.asarray(
        np.stack([xs, ys], -1).reshape(n // chunk, 1, chunk, 2), jnp.float32)

    if coarse_lowres > 1:
        assert model.use_hierarchical_sampling and not model.light_coarse
        f = coarse_lowres
        assert h % f == 0 and w % f == 0, (h, w, f)
        lh, lw = h // f, w // f
        nlr = lh * lw
        lchunk = min(coarse_chunk or chunk, nlr)
        assert nlr % lchunk == 0, (nlr, lchunk)
        lxs, lys = np.meshgrid(np.arange(lw) * f + f // 2,
                               np.arange(lh) * f + f // 2)
        lcoords = jnp.asarray(
            np.stack([lxs, lys], -1).reshape(nlr // lchunk, 1, lchunk, 2),
            jnp.float32)

        def coarse_one(c, cw):
            return model.apply(
                params, ref_data, c, cw, que_depth_range, ref_depth_range,
                method=NeuralRayGenRenderer.coarse_hit_probs)[0]

        def coarse_chunk_fn(c):
            return jax.vmap(lambda cw: coarse_one(c, cw))(c2ws)

        hit = jax.lax.map(coarse_chunk_fn, lcoords)  # (nc, B, lchunk, dn)
        dn = hit.shape[-1]
        b = c2ws.shape[0]
        from panogrf_tpu.nn.blocks import resize_linear
        hit_full = jax.vmap(
            lambda hb: resize_linear(hb, (h, w), axes=(0, 1)))(
            jnp.swapaxes(hit, 0, 1).reshape(b, lh, lw, dn))
        hit_full = jnp.swapaxes(
            hit_full.reshape(b, n // chunk, 1, chunk, dn), 0, 1)

        def fine_one(c, hp, cw):
            out = model.apply(
                params, ref_data, c, hp, cw, que_depth_range,
                ref_depth_range,
                method=NeuralRayGenRenderer.render_fine_from_hit)
            return out["pixel_colors_nr_fine"][0]

        def fine_chunk_fn(args):
            c, hp = args  # hp: (B, 1, chunk, dn)
            return jax.vmap(lambda cw, h_: fine_one(c, h_, cw))(c2ws, hp)

        rgb = jax.lax.map(fine_chunk_fn, (coords, hit_full))
        rgb = jnp.swapaxes(rgb, 0, 1)  # (B, nc, chunk, 3)
        return jnp.clip(rgb.reshape(-1, h, w, 3), 0.0, 1.0)

    def render_one(c, cw):
        out = model.apply(params, ref_data, c, cw, que_depth_range,
                          ref_depth_range,
                          method=NeuralRayGenRenderer.render_rays)
        key = ("pixel_colors_nr_fine" if "pixel_colors_nr_fine" in out
               else "pixel_colors_nr")
        return out[key][0]

    def render_chunk(c):
        return jax.vmap(lambda cw: render_one(c, cw))(c2ws)

    rgb = jax.lax.map(render_chunk, coords)          # (nc, B, chunk, 3)
    rgb = jnp.swapaxes(rgb, 0, 1)
    return jnp.clip(rgb.reshape(-1, h, w, 3), 0.0, 1.0)


def render_image(model: NeuralRayGenRenderer, params: Any, ref_info: dict,
                 que_c2w: Array, que_depth_range: Array,
                 chunk: int = 8192, ref_data: Optional[dict] = None) -> dict:
    """Render a full ERP image.

    :return: dict with ``rgb`` (H, W, 3) and optionally ``depth`` (H, W).
    """
    h, w = model.height, model.width
    if ref_data is None:
        ref_data = prepare_ref_data(model, params, ref_info)

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    coords = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    n = coords.shape[0]
    pad = (-n) % chunk
    coords = np.concatenate([coords, np.zeros((pad, 2), np.float32)])
    num_chunks = coords.shape[0] // chunk

    rgb_out, depth_out = [], []
    for i in range(num_chunks):
        c = jnp.asarray(coords[i * chunk:(i + 1) * chunk][None])
        out = _render_chunk(model, params, ref_data, c, que_c2w,
                            que_depth_range, ref_info["depth_range"])
        key = ("pixel_colors_nr_fine" if "pixel_colors_nr_fine" in out
               else "pixel_colors_nr")
        rgb_out.append(out[key][0])
        if "render_depth_fine" in out:
            depth_out.append(out["render_depth_fine"][0])
    rgb = jnp.concatenate(rgb_out, 0)[:n].reshape(h, w, 3)
    result = {"rgb": jnp.clip(rgb, 0.0, 1.0)}
    if depth_out:
        result["depth"] = jnp.concatenate(depth_out, 0)[:n].reshape(h, w)
    return result
