"""Generalizable spherical radiance-field renderer (NeuralRayGenRenderer).

TPU-native rebuild of reference ``network/renderer.py:35-786``.  Key design
changes versus the reference:

* The per-ray-batch Python loop (``renderer.py:647-686``) is gone: ray
  rendering is one statically-shaped jitted function over a chunk of rays;
  full images map chunks with ``jax.lax.map`` (or shard them across a mesh,
  see ``panogrf_tpu/parallel``).
* The frozen mono/MVS depth stack is run OUTSIDE this module; its depth
  enters through ``ref_data['mvs_depth']`` (see init_net docstring).
* Everything is channel-last and static-shaped; hierarchical sampling uses
  ``stop_gradient`` on coarse hit probabilities exactly like the reference
  (``renderer.py:437``, ``.detach()``).

Pipeline per chunk (reference call stack SURVEY §3.1):
  sample_depth -> depth2points -> project to rfn views -> gather
  (ray_feats, rgb, img_feats) -> logistic-mixture probs -> IBRNet/NeuRay
  aggregation -> alpha compositing; then fine resampling and a second pass.
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
from panogrf_tpu.renderer.dist_decoder import (
    MixtureLogisticsDistDecoder, compute_prob, get_near_far_intervals_ref,
    get_near_far_intervals_que)
from panogrf_tpu.renderer.init_net import CostVolumeInitNet, DefaultVisEncoder

Array = jax.Array


class NeuralRayGenRenderer(nn.Module):
    """Generalizable renderer. See module docstring.

    All reference config knobs keep their names (SURVEY §5.6) where they
    survive: depth_sample_num, fine_depth_sample_num, use_hierarchical_
    sampling, use_disp, fine_depth_use_all, render_depth, render_uncert.
    """
    convention_name: str = "m3d"
    height: int = 512                 # render resolution
    width: int = 1024
    depth_hw: tuple = (256, 512)      # MVS/init-net working resolution
    min_depth: float = 0.5            # render depth range
    max_depth: float = 15.0
    mvs_min_depth: float = 0.1        # init-net depth normalization range
    mvs_max_depth: float = 10.0
    depth_sample_num: int = 64
    fine_depth_sample_num: int = 64
    use_hierarchical_sampling: bool = True
    fine_depth_use_all: bool = False
    use_disp: bool = True
    use_vis: bool = False             # dist-decoder vis head (config: off)
    render_depth: bool = True
    render_uncert: bool = False
    use_self_hit_prob: bool = False
    wrap: bool = True
    # 'bfloat16' halves gather bytes + elementwise traffic in the per-ray
    # pipeline; probability/compositing math stays float32.
    compute_dtype: str = "float32"
    # fast_gather: ONE gather per (sample, view) from a full-resolution
    # [rgb | ray_feats | img_feats] map (features bilinearly upsampled 4x
    # at scene-prep time).  TPU gathers are latency-bound per row, so
    # halving the row count nearly halves the dominant render cost; the
    # trade is re-interpolating an upsampled map (measured < 0.03 dB on
    # synthetic eval).  Off by default for exact reference numerics.
    fast_gather: bool = False
    # light_coarse: serving-only coarse pass replacement — the coarse
    # IBRNet aggregation exists solely to produce the hit-probability
    # importance distribution for fine resampling, so instead use the
    # NeuRay per-view surface statistics directly: decode the coarse
    # dist-decoder heads ONCE per scene on the ray-feature map
    # (prepare_ref), and per sample do a 5-channel gather + logistic CDF
    # + view-mean.  Skips the whole coarse gather/aggregation.  The fine
    # pass is numerically unchanged; only WHERE the 64 fine samples land
    # differs.  Not for training (coarse losses need the full pass).
    light_coarse: bool = False
    # coarse sample count for the proxy pass (0 -> depth_sample_num);
    # the proxy only shapes an importance distribution, so fewer/cheaper
    # samples are viable (quality A/B in bench --ab).
    coarse_proxy_samples: int = 0
    # gather rows in (dn, rn) order: consecutive rows are adjacent rays at
    # one depth index (~1 px apart in the ref map) instead of consecutive
    # samples along one epipolar curve.  Numerics identical — only DRAM
    # access locality changes (see render_ops.project_points_dict).
    gather_depth_major: bool = False
    # fetch merged-map rows only at every S-th depth sample and linearly
    # interpolate the rows in between (epipolar feature interpolation,
    # fast_gather path only; geometry stays exact).  Gather rows are the
    # per-frame latency floor, so S=2 halves the dominant cost; quality
    # A/B in tools/ab_quality.py before changing the default.
    gather_stride: int = 1
    # nearest-tap merged-map fetch (fast_gather only): ONE flat-row gather
    # per (sample, view) instead of the 2x2 bilinear window — halves the
    # fetched DRAM segments of the dominant per-frame cost.  The merged
    # map is already 4x-bilinearly-upsampled, so rounding displaces a
    # smooth feature lookup by <= 0.5 px.  Measured: -0.31 dB on the
    # trained-ckpt A/B (AB_QUALITY_r5.json 'nearest') and SLOWER in-frame
    # (1339 vs 1264 ms — XLA's 2x2 window rides the same DRAM rows), so
    # it stays opt-in.
    gather_nearest: bool = False
    # separate stride for the FINE pass (0 -> gather_stride).  Fine
    # samples are importance-resampled around surfaces, so consecutive
    # samples sit closer together on the epipolar curve than coarse ones
    # — a larger fine stride loses less than the same coarse stride
    # (A/B modes 's4f8' etc. in tools/ab_quality.py).
    gather_stride_fine: int = 0
    # decode-on-map (serving): run the coarse+fine dist-decoder heads ONCE
    # per scene on the full-res ray-feature map (prepare_ref) and append
    # the decoded (mean2, var2, aw) stats to the merged gather map — the
    # per-sample pass then reads 5 stats channels from the row it already
    # fetches instead of running 3x3-layer MLPs on every (sample, view).
    # Row count (the latency floor) is unchanged; the approximation is
    # bilinear interpolation of decoded stats instead of decoding
    # interpolated features (A/B in tools/ab_quality.py, mode 'dmap').
    # fast_gather only; training paths keep the exact decoders.
    decode_on_map: bool = False
    # serving: skip the COARSE pass's view-blended RGB head — the eval
    # image is the fine pass and the coarse pass feeds it only through the
    # density importance, so the fine output is BIT-EXACT; coarse
    # pixel_colors_nr become zeros.  Do NOT enable for training (the
    # coarse render loss reads them) or for DINER serving (its single
    # pass runs the coarse agg and its colors ARE the output); only
    # applied when hierarchical sampling is on (setup()).
    coarse_geometry_only: bool = False

    # __call__ sampling strategy: 'hierarchical' (coarse+fine, the default
    # recipe) or 'diner' (depth-guided sampling end to end — the reference
    # trains this via the diner_depth_guided_sampling cfg flag,
    # ``renderer.py:570-597``).  'diner' uses the coarse decoder/agg only
    # and reads mvs_uncert from ref_imgs_info (constant fallback).
    sampling_mode: str = "hierarchical"
    diner_n_candidates: int = 128
    diner_n_gaussian: int = 8
    # see render_rays_diner: separate-pass merge (reference N_uniform +
    # merge_uniform_diner) / pre-render union (reference contain_uniform)
    diner_n_uniform: int = 0
    diner_contain_uniform: int = 0

    # MEASUREMENT-ONLY stage ablation for perf attribution (bench.py
    # --ablate): 'agg' replaces the IBR aggregation with a trivial
    # reduction of the gathered rows; 'gather' replaces the merged-map
    # row fetch with a constant row (geometry/projection math intact).
    # Output images are garbage — never use outside benchmarking.
    ablate: str = ""

    # 'ERP' (ResUNetLight) or 'ERP+TP' (dual ERP + tangent-patch encoder,
    # reference local_feature_type / init_net_feature_type knobs,
    # ``renderer.py:96-104`` / ``init_net.py:516-524``)
    local_feature_type: str = "ERP"
    init_net_feature_type: str = "ERP"
    nrows: int = 4
    patch_size: int = 64

    def setup(self):
        if self.local_feature_type == "ERP+TP":
            from panogrf_tpu.nn.erp_tp import ERPTPEncoder
            self.image_encoder = ERPTPEncoder(
                out_dim=32, layers=(1, 2, 6), inplanes=16,
                nrows=self.nrows, patch_size=self.patch_size,
                wrap=self.wrap, name="image_encoder")
        else:
            self.image_encoder = ResUNetLight(out_dim=32, layers=(1, 2, 6),
                                              inplanes=16, wrap=self.wrap,
                                              name="image_encoder")
        self.init_net = CostVolumeInitNet(
            depth_hw=self.depth_hw, min_depth=self.mvs_min_depth,
            max_depth=self.mvs_max_depth, wrap=self.wrap,
            feature_type=self.init_net_feature_type, nrows=self.nrows,
            patch_size=self.patch_size, name="init_net")
        self.vis_encoder = DefaultVisEncoder(wrap=self.wrap,
                                             name="vis_encoder")
        self.dist_decoder = MixtureLogisticsDistDecoder(
            use_vis=self.use_vis, name="dist_decoder")
        self.agg_net = DefaultAggregationNet(
            n_samples=self.depth_sample_num,
            geometry_only=(self.coarse_geometry_only
                           and self.use_hierarchical_sampling),
            ablate_attention=(self.ablate == "attn"),
            name="agg_net")
        if self.use_hierarchical_sampling:
            self.fine_dist_decoder = MixtureLogisticsDistDecoder(
                use_vis=self.use_vis, name="fine_dist_decoder")
            self.fine_agg_net = DefaultAggregationNet(
                n_samples=self.fine_depth_sample_num,
                ablate_attention=(self.ablate == "attn"),
                name="fine_agg_net")

    @property
    def convention(self):
        return get_convention(self.convention_name)

    # ------------------------------------------------------------------
    # per-scene encoding
    # ------------------------------------------------------------------

    def prepare_ref(self, ref_imgs: Array, mvs_depth: Array) -> dict:
        """Encode reference views once per scene.

        :param ref_imgs: (rfn, H, W, 3); :param mvs_depth: (rfn, dh, dw, 1).
        :return: dict with imgs, img_feats, ray_feats (all channel-last).
        """
        img_feats = self.image_encoder(ref_imgs)
        ray_feats0 = self.init_net(ref_imgs, mvs_depth)
        ray_feats = self.vis_encoder(ray_feats0, img_feats)
        dt = jnp.dtype(self.compute_dtype)
        out = {"imgs": ref_imgs.astype(dt),
               "img_feats": img_feats.astype(dt),
               "ray_feats": ray_feats.astype(dt), "mvs_depth": mvs_depth}
        # Pre-merge ray+image features into one map: per-sample gathers are
        # latency-bound on TPU, so one 64-ch gather beats two 32-ch ones.
        # Ray features are bilinearly upsampled to the img-feats grid (the
        # maps are bilinearly sampled downstream anyway).
        from panogrf_tpu.nn.blocks import resize_linear
        rf_up = resize_linear(out["ray_feats"],
                              (img_feats.shape[1], img_feats.shape[2]),
                              axes=(1, 2))
        out["merged_feats"] = jnp.concatenate(
            [rf_up, out["img_feats"]], axis=-1)
        if self.fast_gather:
            # One full-res [rgb | ray | img] map -> one gather per sample
            # (see class docstring).  Built once per scene.
            h, w = ref_imgs.shape[1:3]
            mf_full = resize_linear(out["merged_feats"], (h, w),
                                    axes=(1, 2))
            parts = [out["imgs"], mf_full.astype(dt)]
            if self.decode_on_map:
                # decode the mixture heads on the full-res upsampled
                # ray-feature map (same map the per-sample gather would
                # interpolate) and ride the stats on the same gather row
                nd = out["ray_feats"].shape[-1]
                rf_full = mf_full[..., :nd].astype(jnp.float32)
                for dec in ([self.dist_decoder, self.fine_dist_decoder]
                            if self.use_hierarchical_sampling
                            else [self.dist_decoder]):
                    mean, var, vis, aw = dec(rf_full)
                    st = [mean, var, aw] + ([vis] if vis is not None
                                            else [])
                    parts.append(jnp.concatenate(st, -1).astype(dt))
            out["merged_full"] = jnp.concatenate(parts, axis=-1)
        if self.light_coarse:
            # decode the coarse mixture heads ONCE on the ray-feature map
            # (float32: the CDF math downstream is float32 anyway).
            # With fast_gather the full-res upsampled map is available —
            # decode THAT (same map the per-sample path interpolates);
            # the round-2 light_coarse decoded the 1/4-res native map.
            if self.fast_gather:
                nd = out["ray_feats"].shape[-1]
                src = resize_linear(
                    out["merged_feats"][..., :nd],
                    ref_imgs.shape[1:3], axes=(1, 2)).astype(jnp.float32)
            else:
                src = ray_feats.astype(jnp.float32)
            mean, var, vis, aw = self.dist_decoder(src)
            parts = [mean, var, aw] + ([vis] if vis is not None else [])
            out["stats_coarse"] = jnp.concatenate(parts, axis=-1)
        return out

    # ------------------------------------------------------------------
    # core pass
    # ------------------------------------------------------------------

    def render_by_depth(self, que_depth: Array, coords: Array, que_c2w: Array,
                        que_depth_range: Array, ref_data: dict,
                        ref_depth_range: Array, is_fine: bool,
                        perspec_cam: Optional[tuple] = None) -> dict:
        """One rendering pass at given sample depths.

        Reference ``renderer.py:223-317``.
        :param que_depth: (qn, rn, dn); coords (qn, rn, 2); que_c2w (3, 4).
        :param perspec_cam: optional (w2c (qn,3,4), K (qn,3,3)) — renders a
            perspective (cube-face) query camera instead of an ERP one
            (reference ``is_perspec`` path, render_cubes.py).
        """
        conv = self.convention
        que_dists = ro.depth2inv_dists(que_depth, que_depth_range)
        if perspec_cam is not None:
            que_pts, que_dir = ro.depth2points_perspective(
                coords, que_depth, perspec_cam[0], perspec_cam[1])
        else:
            directions = conv.ray_directions(self.height, self.width)
            que_pts, que_dir = ro.depth2points_spherical(coords, que_depth,
                                                         que_c2w, directions)
        dt = jnp.dtype(self.compute_dtype)
        stride = (self.gather_stride_fine or self.gather_stride) \
            if is_fine else self.gather_stride
        # stride > dn would collapse every ray to ONE fetched row
        # (constant features along the ray) — clamp for small debug dn
        stride = max(1, min(stride, que_depth.shape[-1] // 2))
        ref_for_prj = ref_data
        if "gather" in self.ablate and "merged_full" in ref_data:
            # perf attribution only: constant 1x1 map -> the row "fetch"
            # degenerates to a broadcast while every other stage
            # (projection math, decode, agg, composite) runs unchanged
            ref_for_prj = dict(ref_data)
            ref_for_prj["merged_full"] = \
                ref_data["merged_full"][:, :1, :1] * 0 + 0.1
        prj = ro.project_points_dict(ref_for_prj, que_pts, conv,
                                     que_dir=que_dir.astype(dt),
                                     depth_major=self.gather_depth_major,
                                     gather_stride=stride,
                                     gather_nearest=self.gather_nearest)

        if "stats" in prj:
            # decode-on-map: per-sample stats were gathered with the row
            # (prepare_ref decoded the heads on the map); split the
            # coarse/fine halves and skip the per-sample MLPs.
            sw = prj["stats"].shape[-1]
            half = sw // 2 if self.use_hierarchical_sampling else sw
            st = prj["stats"][..., half:half * 2] if is_fine \
                else prj["stats"][..., :half]
            st = st.astype(jnp.float32)
            mean, var, aw = st[..., 0:2], st[..., 2:4], st[..., 4:5]
            vis = st[..., 5:6] if (self.use_vis and half > 5) else None
        else:
            decoder = (self.fine_dist_decoder if is_fine
                       else self.dist_decoder)
            mean, var, vis, aw = decoder(prj["ray_feats"])
        # probability math in float32 regardless of compute dtype; all of
        # it is per-point, so it runs in whichever layout the projection
        # emitted ('dnr' = depth-major rows stay untransposed, see
        # render_ops.project_points_dict)
        f32 = lambda t: None if t is None else t.astype(jnp.float32)
        if prj.get("layout") == "dnr":
            from panogrf_tpu.renderer.dist_decoder import \
                get_near_far_intervals_ref_dm
            near, far = get_near_far_intervals_ref_dm(
                prj["depth"][..., 0], que_dists, ref_depth_range)
        else:
            near, far = get_near_far_intervals_ref(
                prj["depth"][..., 0], que_dists, ref_depth_range)
        alpha, visibility, hit_prob = compute_prob(
            near, far, f32(mean), f32(var), f32(vis), f32(aw), self.use_vis)
        prj["alpha"] = alpha[..., None].astype(dt)
        prj["vis"] = visibility[..., None].astype(dt)
        prj["hit_prob"] = hit_prob[..., None].astype(dt)
        if "dir" in prj:
            prj["dir"] = prj["dir"].astype(dt)

        if "agg" in self.ablate:
            # perf attribution only: trivial per-point reduction in place
            # of the IBR aggregation (keeps gather + decode + composite)
            density = jnp.sum(prj["hit_prob"][..., 0] + 1e-3 *
                              jnp.sum(prj["ray_feats"], -1), axis=-1)
            colors = jnp.mean(prj["rgb"], axis=-2)
            if prj.get("layout") == "dnr":
                density = jnp.swapaxes(density, 1, 2)
                colors = jnp.swapaxes(colors, 1, 2)
        else:
            agg = self.fine_agg_net if is_fine else self.agg_net
            density, colors = agg(prj, que_dir.astype(dt))
        density = density.astype(jnp.float32)
        colors = colors.astype(jnp.float32)
        comp = ro.density2outputs(density, colors, que_depth)

        outputs = {
            "pixel_colors_nr": comp["pixel_colors"],
            "hit_prob_nr": comp["hit_prob"],
            "colors_nr": colors,
            "density_nr": density,
            "que_depth": que_depth,
        }
        if self.render_depth:
            outputs["render_depth"] = comp["render_depth"]
        if self.render_uncert:
            d = comp["render_depth"][..., None]
            outputs["render_uncert"] = jnp.sum(
                (que_depth - d) ** 2 * comp["hit_prob"], axis=-1) + 1e-5
        return outputs

    def coarse_hit_proxy(self, ref_data: dict, que_depth: Array,
                         coords: Array, que_c2w: Array,
                         que_depth_range: Array, ref_depth_range: Array,
                         perspec_cam: Optional[tuple] = None) -> Array:
        """Importance distribution from the per-view NeuRay surface
        statistics alone (see ``light_coarse``): gather the precomputed
        (mean, var, aw) map, run the logistic-mixture CDF per sample, and
        average the per-view hit probability.

        :return: (qn, rn, dn) proxy hit probability.
        """
        conv = self.convention
        que_dists = ro.depth2inv_dists(que_depth, que_depth_range)
        if perspec_cam is not None:
            que_pts, _ = ro.depth2points_perspective(
                coords, que_depth, perspec_cam[0], perspec_cam[1])
        else:
            directions = conv.ray_directions(self.height, self.width)
            que_pts, _ = ro.depth2points_spherical(coords, que_depth,
                                                   que_c2w, directions)
        prj = ro.project_stats(ref_data, que_pts, conv)
        st = prj["stats"].astype(jnp.float32)
        mean, var, aw = st[..., 0:2], st[..., 2:4], st[..., 4:5]
        vis = st[..., 5:6] if (self.use_vis and st.shape[-1] > 5) else None
        near, far = get_near_far_intervals_ref(
            prj["depth"][..., 0], que_dists, ref_depth_range)
        _, _, hit_prob = compute_prob(near, far, mean, var, vis, aw,
                                      self.use_vis)
        return jnp.mean(hit_prob, axis=-1)

    def predict_self_hit_prob(self, que_ray_feats: Array, que_depth: Array,
                              que_dists: Array, que_depth_range: Array,
                              is_fine: bool) -> Array:
        """Query-view self hit-prob for the consistency loss (reference
        ``renderer.py:190-208``)."""
        decoder = self.fine_dist_decoder if is_fine else self.dist_decoder
        mean, var, vis, aw = decoder(que_ray_feats)
        near, far = get_near_far_intervals_que(que_depth, que_dists,
                                               que_depth_range)
        _, _, hit = compute_prob(near, far, mean[:, :, None], var[:, :, None],
                                 None if vis is None else vis[:, :, None],
                                 aw[:, :, None], self.use_vis)
        return hit

    # ------------------------------------------------------------------
    # coarse + fine
    # ------------------------------------------------------------------

    def render_rays(self, ref_data: dict, coords: Array, que_c2w: Array,
                    que_depth_range: Array, ref_depth_range: Array,
                    rng: Optional[jax.Array] = None,
                    perspec_cam: Optional[tuple] = None) -> dict:
        """Full coarse(+fine) rendering of a chunk of rays.

        Reference ``render_impl`` (``renderer.py:567-633``).
        ``rng`` enables stochastic (training) sampling.
        """
        qn, rn, _ = coords.shape
        r_coarse = r_fine = None
        if rng is not None:
            r_coarse, r_fine = jax.random.split(rng)

        if self.light_coarse and self.use_hierarchical_sampling:
            # serving fast path: proxy importance -> single full fine pass
            cdn = self.coarse_proxy_samples or self.depth_sample_num
            que_depth, _ = ro.sample_depth(qn, rn, cdn, self.min_depth,
                                           self.max_depth, self.use_disp,
                                           r_coarse)
            hit = self.coarse_hit_proxy(ref_data, que_depth, coords,
                                        que_c2w, que_depth_range,
                                        ref_depth_range, perspec_cam)
            fine_depth = ro.sample_fine_depth(
                que_depth, hit, que_depth_range, self.fine_depth_sample_num,
                r_fine, inv_mode=self.use_disp)
            if r_fine is not None:
                # deterministic u is increasing and F^-1 is monotone, so
                # the serving output is already sorted (bit-exact skip)
                fine_depth = jnp.sort(fine_depth, axis=-1)
            fine_out = self.render_by_depth(fine_depth, coords, que_c2w,
                                            que_depth_range, ref_data,
                                            ref_depth_range, is_fine=True,
                                            perspec_cam=perspec_cam)
            # base keys mirror the fine pass (like the DINER mode) so both
            # metric-key families resolve
            return {**fine_out,
                    **{k + "_fine": v for k, v in fine_out.items()}}

        que_depth, _ = ro.sample_depth(qn, rn, self.depth_sample_num,
                                       self.min_depth, self.max_depth,
                                       self.use_disp, r_coarse)
        outputs = self.render_by_depth(que_depth, coords, que_c2w,
                                       que_depth_range, ref_data,
                                       ref_depth_range, is_fine=False,
                                       perspec_cam=perspec_cam)

        if self.use_hierarchical_sampling:
            hit = jax.lax.stop_gradient(outputs["hit_prob_nr"])
            fine_depth = ro.sample_fine_depth(
                que_depth, hit, que_depth_range, self.fine_depth_sample_num,
                r_fine, inv_mode=self.use_disp)
            if self.fine_depth_use_all:
                fine_depth = jnp.concatenate([que_depth, fine_depth], -1)
            if r_fine is not None or self.fine_depth_use_all:
                # stochastic u (training) or the concat path need the
                # sort; deterministic inverse-CDF output is already sorted
                fine_depth = jnp.sort(fine_depth, axis=-1)
            fine_out = self.render_by_depth(fine_depth, coords, que_c2w,
                                            que_depth_range, ref_data,
                                            ref_depth_range, is_fine=True,
                                            perspec_cam=perspec_cam)
            for k, v in fine_out.items():
                outputs[k + "_fine"] = v
        return outputs

    def coarse_hit_probs(self, ref_data: dict, coords: Array,
                         que_c2w: Array, que_depth_range: Array,
                         ref_depth_range: Array) -> Array:
        """Coarse importance only: deterministic stratified depths + the
        full coarse pass, returning ``hit_prob_nr`` (qn, rn, dn).

        Serving-only building block for the LOW-RES COARSE pass
        (``full_render.render_image_device(coarse_lowres=f)``): in
        deterministic mode ``sample_depth`` gives every ray the SAME
        depth ticks, so one ray's hit-probability CDF is directly
        applicable to its neighbours — the coarse pass can run on an
        (H/f, W/f) ray grid and be bilinearly upsampled.  The reference
        has no analogue (its coarse pass always runs per output ray,
        ``network/renderer.py:567-633``).
        """
        qn, rn, _ = coords.shape
        que_depth, _ = ro.sample_depth(qn, rn, self.depth_sample_num,
                                       self.min_depth, self.max_depth,
                                       self.use_disp, None)
        out = self.render_by_depth(que_depth, coords, que_c2w,
                                   que_depth_range, ref_data,
                                   ref_depth_range, is_fine=False)
        return out["hit_prob_nr"]

    def render_fine_from_hit(self, ref_data: dict, coords: Array,
                             hit_prob: Array, que_c2w: Array,
                             que_depth_range: Array,
                             ref_depth_range: Array) -> dict:
        """Fine pass driven by an externally-supplied coarse importance
        (see :meth:`coarse_hit_probs`).  With ``hit_prob`` equal to this
        model's own coarse ``hit_prob_nr`` the output is bit-exact to the
        hierarchical path (deterministic sampling only — the inverse-CDF
        output is already sorted)."""
        qn, rn, _ = coords.shape
        que_depth, _ = ro.sample_depth(qn, rn, self.depth_sample_num,
                                       self.min_depth, self.max_depth,
                                       self.use_disp, None)
        fine_depth = ro.sample_fine_depth(
            que_depth, hit_prob, que_depth_range,
            self.fine_depth_sample_num, None, inv_mode=self.use_disp)
        fine_out = self.render_by_depth(fine_depth, coords, que_c2w,
                                        que_depth_range, ref_data,
                                        ref_depth_range, is_fine=True)
        return {**fine_out, **{k + "_fine": v for k, v in fine_out.items()}}

    def render_rays_diner(self, ref_data: dict, coords: Array,
                          que_c2w: Array, que_depth_range: Array,
                          ref_depth_range: Array,
                          n_candidates: int = 128, n_gaussian: int = 8,
                          depth_diff_max: float = 0.05,
                          diner_sigma: float = 0.0,
                          rng: Optional[jax.Array] = None,
                          backface_culling: bool = False,
                          contain_uniform: int = 0,
                          n_uniform: int = 0) -> dict:
        """DINER occlusion-aware depth-guided rendering (reference
        ``renderer.py:570-597`` + ``original_depth_guided_sample.py``).

        ``ref_data`` additionally needs ``mvs_depth`` and ``mvs_uncert``
        maps.  Candidates are shortlisted by MVS surface likelihood and the
        selected depths rendered with the coarse decoder.
        ``backface_culling`` computes per-view MVS normals
        (``depth2normal``) and discards candidates seen from behind
        (reference ``renderer.py:713-714`` + ``render_ops.py:260-290``).

        Two uniform-coverage fallbacks (guided samples alone miss any
        surface the MVS prior missed):

        * ``contain_uniform`` > 0 concatenates that many uniform coarse
          samples into the guided set BEFORE the single rendering pass
          (sorted union — reference ``contain_uniform``/``n_uniform``,
          ``renderer.py:345-349``).
        * ``n_uniform`` > 0 renders that many uniform (disparity-spaced)
          samples in a SECOND pass through the same coarse decoder/agg and
          merges the two composites by sorted depth union (reference
          ``N_uniform`` + ``merge_uniform_diner``, ``renderer.py:526-565``
          invoked at ``:577-583``; its ``one_mlp`` precondition holds here
          by construction since both passes use ``is_fine=False``).
        """
        from panogrf_tpu.renderer.diner import (project_depth_info,
                                                sample_depthguided)
        conv = self.convention
        qn, rn, _ = coords.shape
        cand, _ = ro.sample_depth(qn, rn, n_candidates, self.min_depth,
                                  self.max_depth, use_disp=False)
        directions = conv.ray_directions(self.height, self.width)
        que_pts, que_dir = ro.depth2points_spherical(coords, cand, que_c2w,
                                                     directions)
        if backface_culling and "mvs_normal" not in ref_data:
            from panogrf_tpu.renderer.sph_solver import depth2normal
            ref_data = dict(ref_data)
            ref_data["mvs_normal"] = depth2normal(ref_data["mvs_depth"],
                                                  conv)
        prj = project_depth_info(ref_data, que_pts, conv)
        que_depth = sample_depthguided(
            cand, prj, self.depth_sample_num, n_gaussian, self.min_depth,
            self.max_depth, depth_diff_max, diner_sigma, rng,
            que_dir=que_dir if backface_culling else None,
            w2c=ref_data["w2c"] if backface_culling else None)
        if contain_uniform > 0:
            uni, _ = ro.sample_depth(qn, rn, contain_uniform,
                                     self.min_depth, self.max_depth,
                                     use_disp=self.use_disp)
            que_depth = jnp.sort(
                jnp.concatenate([que_depth, uni], axis=-1), axis=-1)
        outputs = self.render_by_depth(que_depth, coords, que_c2w,
                                       que_depth_range, ref_data,
                                       ref_depth_range, is_fine=False)
        if n_uniform > 0:
            uni, _ = ro.sample_depth(qn, rn, n_uniform, self.min_depth,
                                     self.max_depth, use_disp=self.use_disp)
            uni_out = self.render_by_depth(uni, coords, que_c2w,
                                           que_depth_range, ref_data,
                                           ref_depth_range, is_fine=False)
            z, colors, density, comp = ro.merge_composites(
                outputs["que_depth"], outputs["colors_nr"],
                outputs["density_nr"], uni_out["que_depth"],
                uni_out["colors_nr"], uni_out["density_nr"])
            outputs = dict(outputs)
            outputs.update(que_depth=z, colors_nr=colors,
                           density_nr=density,
                           pixel_colors_nr=comp["pixel_colors"],
                           hit_prob_nr=comp["hit_prob"])
            if self.render_depth:
                outputs["render_depth"] = comp["render_depth"]
            if self.render_uncert:
                d = comp["render_depth"][..., None]
                outputs["render_uncert"] = jnp.sum(
                    (z - d) ** 2 * comp["hit_prob"], axis=-1) + 1e-5
        # reference appends '_fine' suffixes for the loss/metric stack
        return {**outputs, **{k + "_fine": v for k, v in outputs.items()}}

    # ------------------------------------------------------------------
    # depth-loss head
    # ------------------------------------------------------------------

    def predict_mean_for_depth_loss(self, ray_feats: Array,
                                    coords: Array) -> dict:
        """Expected depth decoded from ray features at sampled coords.

        Reference ``renderer.py:731-775``: interpolate ray features at
        (rfn, pn, 2) full-res coords, decode the first mixture mean.
        """
        from panogrf_tpu.ops.resample import interpolate_feats
        feats = interpolate_feats(ray_feats, coords, self.height, self.width)
        mean = self.dist_decoder.predict_mean(feats)
        out = {"depth_mean": mean[..., 0], "depth_mean_2": mean[..., 1]}
        if self.use_hierarchical_sampling:
            mean_f = self.fine_dist_decoder.predict_mean(feats)
            out["depth_mean_fine"] = mean_f[..., 0]
            out["depth_mean_fine_2"] = mean_f[..., 1]
        return out

    # ------------------------------------------------------------------
    # reference-compatible entry point
    # ------------------------------------------------------------------

    def __call__(self, data: Dict[str, Any],
                 rng: Optional[jax.Array] = None) -> dict:
        """Train-step style forward (reference ``renderer.py:777-786``).

        ``data`` keys:
          ref_imgs_info: imgs (rfn,H,W,3), mvs_depth (rfn,dh,dw,1),
              depth_range (rfn,2), true_depth (optional).
          que_imgs_info: coords (qn,rn,2), c2w (3,4), depth_range (qn,2),
              optional imgs / ray-feat consistency inputs.
        """
        ref_info = data["ref_imgs_info"]
        que_info = data["que_imgs_info"]
        ref_data = self.prepare_ref(ref_info["imgs"], ref_info["mvs_depth"])
        ref_data["w2c"] = ref_info["w2c"]
        if self.sampling_mode == "diner":
            ref_data["mvs_depth"] = ref_info["mvs_depth"]
            ref_data["mvs_uncert"] = ref_info.get(
                "mvs_uncert", 0.04 * jnp.ones_like(ref_info["mvs_depth"]))
            outputs = self.render_rays_diner(
                ref_data, que_info["coords"], que_info["c2w"],
                que_info["depth_range"], ref_info["depth_range"],
                n_candidates=self.diner_n_candidates,
                n_gaussian=self.diner_n_gaussian, rng=rng,
                n_uniform=self.diner_n_uniform,
                contain_uniform=self.diner_contain_uniform)
        else:
            outputs = self.render_rays(ref_data, que_info["coords"],
                                       que_info["c2w"],
                                       que_info["depth_range"],
                                       ref_info["depth_range"], rng)

        if self.use_self_hit_prob and "imgs" in que_info and \
                "mvs_depth" in que_info:
            que_enc = self.prepare_ref(que_info["imgs"],
                                       que_info["mvs_depth"])
            from panogrf_tpu.ops.resample import interpolate_feats
            que_ray_feats = interpolate_feats(
                que_enc["ray_feats"], que_info["coords"], self.height,
                self.width)
            que_dists = ro.depth2inv_dists(outputs["que_depth"],
                                           que_info["depth_range"])
            outputs["hit_prob_self"] = self.predict_self_hit_prob(
                que_ray_feats, outputs["que_depth"], que_dists,
                que_info["depth_range"], is_fine=False)
            if self.use_hierarchical_sampling:
                que_dists_f = ro.depth2inv_dists(
                    outputs["que_depth_fine"], que_info["depth_range"])
                outputs["hit_prob_self_fine"] = self.predict_self_hit_prob(
                    que_ray_feats, outputs["que_depth_fine"], que_dists_f,
                    que_info["depth_range"], is_fine=True)

        if "imgs" in que_info:
            gt = ro.gather_at_coords_batched(que_info["imgs"],
                                             que_info["coords"])
            outputs["pixel_colors_gt"] = gt
            if self.use_hierarchical_sampling or \
                    self.sampling_mode == "diner":
                outputs["pixel_colors_gt_fine"] = gt

        # ray_mask: all projections valid on the sphere (reference
        # ``renderer.py:291-298`` builds it from an all-ones mask).
        qn, rn, _ = que_info["coords"].shape
        outputs["ray_mask"] = jnp.ones((qn, rn), bool)

        # per-ray sin(phi) weight for the polar-weighted render loss
        # (reference computes it in the dataset, ``habitat_data_neuray.py``
        # polar_weights, consumed by ``network/loss.py:95-116``); attached
        # unconditionally — ``render_loss`` only reads it when
        # ``use_polar_weighted_loss`` is on.
        y = que_info["coords"][..., 1]
        outputs["polar_weights"] = jnp.sin((y + 0.5) * jnp.pi / self.height)

        if "true_depth" in ref_info:
            rfn = ref_info["imgs"].shape[0]
            depth_coords = data.get("depth_coords")
            if depth_coords is None:
                depth_coords = jnp.broadcast_to(
                    que_info["coords"][0][None],
                    (rfn, *que_info["coords"].shape[1:]))
            outputs["depth_coords"] = depth_coords
            outputs.update(self.predict_mean_for_depth_loss(
                ref_data["ray_feats"], depth_coords))
        return outputs
