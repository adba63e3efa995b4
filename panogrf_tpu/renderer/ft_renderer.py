"""Per-scene finetuning renderer (NeuralRayFtRenderer).

Reference ``network/renderer.py:788-1200``: per-view ray features become
TRAINABLE parameters (initialized by running the gen model's init net once,
``:954-1036``), the MLP/encoder weights start from the gen checkpoint
(``:1013-1029``), MVS depth/uncertainty are cached constants, and fine
sampling may be depth-guided within 3 sigma of the cached MVS depth
(``:1080-1096,439-457``).

Here the ft renderer is a Flax module whose submodules carry the SAME names
as :class:`NeuralRayGenRenderer` so gen params transplant by key, plus a
``ray_feats`` parameter of shape (rfn, fh, fw, F).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from panogrf_tpu.core.sphere import get_convention
from panogrf_tpu.nn.blocks import ResUNetLight
from panogrf_tpu.renderer import render_ops as ro
from panogrf_tpu.renderer.agg_net import DefaultAggregationNet
from panogrf_tpu.renderer.dist_decoder import MixtureLogisticsDistDecoder
from panogrf_tpu.renderer.init_net import DefaultVisEncoder
from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
from panogrf_tpu.renderer.sample_utils import (precompute_depth_sampling,
                                               sample_3sigma)

Array = jax.Array


class NeuralRayFtRenderer(nn.Module):
    """Scene-specialized renderer with trainable ray features."""
    rfn: int = 2
    ray_feats_hw: tuple = (64, 128)
    feat_dim: int = 32
    convention_name: str = "m3d"
    height: int = 512
    width: int = 1024
    min_depth: float = 0.5
    max_depth: float = 15.0
    depth_sample_num: int = 64
    fine_depth_sample_num: int = 64
    use_hierarchical_sampling: bool = True
    fine_depth_use_all: bool = False
    use_disp: bool = True
    use_vis: bool = False
    render_depth: bool = True
    render_uncert: bool = False
    wrap: bool = True
    compute_dtype: str = "float32"
    # serving knobs read by the borrowed NeuralRayGenRenderer.
    # render_by_depth (gather row order / epipolar feature interpolation
    # — see the gen renderer's field docs); defaults = exact numerics.
    gather_depth_major: bool = False
    gather_stride: int = 1
    gather_stride_fine: int = 0
    gather_nearest: bool = False
    ablate: str = ""   # measurement-only stage ablation (see gen renderer)

    def setup(self):
        fh, fw = self.ray_feats_hw
        # From-scratch init is randn like reference ``renderer.py:1030-1036``;
        # init_ft_params_from_gen overwrites with the gen init-net output.
        self.ray_feats = self.param(
            "ray_feats", nn.initializers.normal(1.0),
            (self.rfn, fh, fw, self.feat_dim))
        self.image_encoder = ResUNetLight(out_dim=32, layers=(1, 2, 6),
                                          inplanes=16, wrap=self.wrap,
                                          name="image_encoder")
        self.vis_encoder = DefaultVisEncoder(wrap=self.wrap,
                                             name="vis_encoder")
        self.dist_decoder = MixtureLogisticsDistDecoder(
            use_vis=self.use_vis, name="dist_decoder")
        self.agg_net = DefaultAggregationNet(
            n_samples=self.depth_sample_num, name="agg_net")
        if self.use_hierarchical_sampling:
            self.fine_dist_decoder = MixtureLogisticsDistDecoder(
                use_vis=self.use_vis, name="fine_dist_decoder")
            self.fine_agg_net = DefaultAggregationNet(
                n_samples=self.fine_depth_sample_num, name="fine_agg_net")

    @property
    def convention(self):
        return get_convention(self.convention_name)

    # Share the gen-renderer pass implementations.
    render_by_depth = NeuralRayGenRenderer.render_by_depth

    def prepare_ref(self, ref_imgs: Array) -> dict:
        img_feats = self.image_encoder(ref_imgs)
        ray_feats = self.vis_encoder(self.ray_feats, img_feats)
        return {"imgs": ref_imgs, "img_feats": img_feats,
                "ray_feats": ray_feats}

    def render_rays(self, ref_data: dict, coords: Array, que_c2w: Array,
                    que_depth_range: Array, ref_depth_range: Array,
                    rng: Optional[jax.Array] = None,
                    ft_depth_range: Optional[Array] = None) -> dict:
        """Coarse + fine with optional 3-sigma depth guidance.

        ``ft_depth_range``: (qn, rn, 3) = (depth, mu-3s, mu+3s) from
        ``precompute_depth_sampling`` on cached MVS depth/uncert; rays whose
        lower bound is below min_depth fall back to hierarchical samples
        (reference ``renderer.py:439-457``).
        """
        qn, rn, _ = coords.shape
        r_coarse = r_fine = None
        if rng is not None:
            r_coarse, r_fine = jax.random.split(rng)
        que_depth, _ = ro.sample_depth(qn, rn, self.depth_sample_num,
                                       self.min_depth, self.max_depth,
                                       self.use_disp, r_coarse)
        outputs = self.render_by_depth(que_depth, coords, que_c2w,
                                       que_depth_range, ref_data,
                                       ref_depth_range, is_fine=False)
        if self.use_hierarchical_sampling:
            hit = jax.lax.stop_gradient(outputs["hit_prob_nr"])
            fine_depth = ro.sample_fine_depth(
                que_depth, hit, que_depth_range, self.fine_depth_sample_num,
                r_fine, inv_mode=self.use_disp)
            if ft_depth_range is not None:
                guided = sample_3sigma(
                    ft_depth_range[..., 1], ft_depth_range[..., 2],
                    self.fine_depth_sample_num, self.min_depth,
                    self.max_depth, r_fine)
                valid = (ft_depth_range[..., 0] >= self.min_depth)[..., None]
                fine_depth = jnp.where(valid, guided, fine_depth)
            if self.fine_depth_use_all:
                fine_depth = jnp.concatenate([que_depth, fine_depth], -1)
            fine_depth = jnp.sort(fine_depth, axis=-1)
            fine_out = self.render_by_depth(fine_depth, coords, que_c2w,
                                            que_depth_range, ref_data,
                                            ref_depth_range, is_fine=True)
            for k, v in fine_out.items():
                outputs[k + "_fine"] = v
        return outputs

    def __call__(self, data: Dict[str, Any],
                 rng: Optional[jax.Array] = None) -> dict:
        """Train/render forward. ``data`` like the gen renderer, except
        ref_imgs_info needs no mvs_depth (cached in ft_depth_range)."""
        ref_info = data["ref_imgs_info"]
        que_info = data["que_imgs_info"]
        ref_data = self.prepare_ref(ref_info["imgs"])
        ref_data["w2c"] = ref_info["w2c"]
        outputs = self.render_rays(
            ref_data, que_info["coords"], que_info["c2w"],
            que_info["depth_range"], ref_info["depth_range"], rng,
            ft_depth_range=que_info.get("ft_depth_range"))
        if "imgs" in que_info:
            gt = ro.gather_at_coords_batched(que_info["imgs"],
                                             que_info["coords"])
            outputs["pixel_colors_gt"] = gt
        qn, rn, _ = que_info["coords"].shape
        outputs["ray_mask"] = jnp.ones((qn, rn), bool)
        return outputs


def init_ft_params_from_gen(ft_model: NeuralRayFtRenderer,
                            gen_model: NeuralRayGenRenderer, gen_params: Any,
                            ref_info: dict, rng: jax.Array,
                            example_data: dict) -> tuple:
    """Build ft params: gen weights transplanted + init-net ray features.

    Reference ``renderer.py:954-1036`` (_initialization): ray features come
    from the gen init net (pre-vis-encoder — the ft model applies its own
    vis encoder at every forward), MLP/encoder weights copy over by name,
    and the per-view MVS depth (+ uncertainty when provided) is cached for
    depth-guided fine sampling (``precompute_depth_sampling``).

    :return: (ft_params, cache); cache = {"mvs_depth": (rfn, dh, dw, 1)
        [, "mvs_uncert"]} ready for :func:`ft_depth_range_at_coords`.
    """
    ft_params = ft_model.init(rng, example_data)
    # ray_feats = raw init-net output (pre-vis-encoder features); the ft
    # forward applies the (transplanted) vis encoder itself.
    raw = gen_model.apply(
        gen_params, method=lambda m: m.init_net(ref_info["imgs"],
                                                ref_info["mvs_depth"]))
    params = jax.tree_util.tree_map(lambda x: x, ft_params)  # shallow copy
    p = params["params"]
    p["ray_feats"] = raw
    # transplant shared submodules by name.
    gp = gen_params["params"]
    for key in ["image_encoder", "vis_encoder", "dist_decoder", "agg_net",
                "fine_dist_decoder", "fine_agg_net"]:
        if key in gp and key in p:
            p[key] = gp[key]
    cache = {"mvs_depth": ref_info["mvs_depth"]}
    if "mvs_uncert" in ref_info:
        cache["mvs_uncert"] = ref_info["mvs_uncert"]
    return params, cache


def ft_depth_range_at_coords(cache: dict, view_idx, coords: Array,
                             height: int, width: int,
                             fixed_sigma: float | None = None) -> Array:
    """Per-ray (depth, mu-3s, mu+3s) prior for depth-guided fine sampling.

    Reference ``renderer.py:1080-1096``: gather the cached MVS depth (and
    std = sqrt(uncert), or ``ft_fixed_sigma``) of the query view at the
    train coords, then ``precompute_depth_sampling``.

    :param coords: (qn, rn, 2) pixel coords in the (height, width) frame.
    :return: (qn, rn, 3).
    """
    from panogrf_tpu.ops.resample import interpolate_feats
    depth_map = cache["mvs_depth"][view_idx][None]         # (1, dh, dw, 1)
    d = interpolate_feats(depth_map, coords, height, width)[..., 0]
    if fixed_sigma is not None:
        std = jnp.full_like(d, fixed_sigma)
    elif "mvs_uncert" in cache:
        u = interpolate_feats(cache["mvs_uncert"][view_idx][None], coords,
                              height, width)[..., 0]
        std = jnp.sqrt(jnp.maximum(u, 1e-8))
    else:
        std = 0.1 * d  # fallback: 10% relative std
    return precompute_depth_sampling(d, std)
