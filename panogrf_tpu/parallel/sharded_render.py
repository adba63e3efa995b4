"""Mesh-sharded full-pano rendering and data-parallel training step.

The scaling dimension of this workload is RAYS (512*1024 per pano, SURVEY
§2.8/§5.7): we shard the ray axis of the query across the mesh, replicate
the (small) reference-view features and parameters, and let XLA insert the
all-gather only at image assembly.  No reference equivalent exists
(multi-GPU raises NotImplementedError, ``train/trainer.py:233-236``).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from panogrf_tpu.parallel.mesh import RAY_AXIS
from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer

Array = jax.Array


def render_image_sharded(model: NeuralRayGenRenderer, params: Any,
                         ref_data: dict, que_c2w: Array,
                         que_depth_range: Array, ref_depth_range: Array,
                         mesh: Mesh, coarse_lowres: int = 1) -> Array:
    """Render a full pano with rays sharded across ``mesh``'s ray axis.

    Each device renders H*W/n_ray_shards rays; the gather back to a full
    (H, W, 3) image is the only cross-device communication.

    :param coarse_lowres: f > 1 runs the coarse importance pass on an
        (H/f, W/f) ray grid (also ray-sharded) and bilinearly upsamples
        its hit-prob to drive the full-res fine pass — composing the
        serving lowres-coarse cut (``full_render.render_image_device``)
        with mesh sharding.  The upsample is the one extra collective
        (the (lh, lw, dn) hit map is tiny next to the image gather).
    """
    h, w = model.height, model.width
    n = h * w
    n_shards = mesh.shape[RAY_AXIS]
    assert n % n_shards == 0

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    coords = jnp.asarray(np.stack([xs, ys], -1).reshape(1, n, 2), jnp.float32)

    ray_sh = NamedSharding(mesh, P(None, RAY_AXIS))
    rep = NamedSharding(mesh, P())
    coords = jax.device_put(coords, ray_sh)
    params = jax.device_put(params, rep)
    ref_data = jax.device_put(ref_data, rep)

    if coarse_lowres > 1:
        f = coarse_lowres
        assert h % f == 0 and w % f == 0 and (h // f) * (w // f) % \
            n_shards == 0, (h, w, f, n_shards)
        lh, lw = h // f, w // f
        lxs, lys = np.meshgrid(np.arange(lw) * f + f // 2,
                               np.arange(lh) * f + f // 2)
        lcoords = jax.device_put(
            jnp.asarray(np.stack([lxs, lys], -1).reshape(1, lh * lw, 2),
                        jnp.float32), ray_sh)

        @jax.jit
        def run_lowres(params, ref_data, lcoords, coords):
            from panogrf_tpu.nn.blocks import resize_linear
            hit = model.apply(params, ref_data, lcoords, que_c2w,
                              que_depth_range, ref_depth_range,
                              method=NeuralRayGenRenderer.coarse_hit_probs)
            dn = hit.shape[-1]
            hit_full = resize_linear(hit[0].reshape(lh, lw, dn), (h, w),
                                     axes=(0, 1)).reshape(1, n, dn)
            hit_full = jax.lax.with_sharding_constraint(hit_full, ray_sh)
            out = model.apply(
                params, ref_data, coords, hit_full, que_c2w,
                que_depth_range, ref_depth_range,
                method=NeuralRayGenRenderer.render_fine_from_hit)
            return out["pixel_colors_nr_fine"]

        rgb = run_lowres(params, ref_data, lcoords, coords)
        return jnp.clip(rgb.reshape(h, w, 3), 0.0, 1.0)

    @jax.jit
    def run(params, ref_data, coords):
        out = model.apply(params, ref_data, coords, que_c2w,
                          que_depth_range, ref_depth_range,
                          method=NeuralRayGenRenderer.render_rays)
        key = ("pixel_colors_nr_fine" if "pixel_colors_nr_fine" in out
               else "pixel_colors_nr")
        return out[key]

    rgb = run(params, ref_data, coords)
    return jnp.clip(rgb.reshape(h, w, 3), 0.0, 1.0)
