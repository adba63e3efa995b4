"""360° MVS depth network (spherical sweep + 3D CNN), Flax/NHWC.

TPU-native rebuild of reference ``network/omni_mvsnet/pipeline3_model.py``
(FullPipeline, forward ``estimate_depth_using_cost_volume_v3_erp`` at
:602-949 and the multiview variant :951-1300):

* MaGNet-style depth hypotheses: ``N_s`` mono-guided samples mu + k*sigma
  (k from the inverse normal CDF over sampling range beta,
  ``pipeline3_model.py:537-545``) concatenated with uniform global
  hypotheses and **sorted** (``:723-733,781-815``).
* Spherical sweep cost volume — vectorized over all hypotheses
  (:mod:`panogrf_tpu.ops.cost_volume`), no Python D-loop.
* 3D UNet regularizer (``unet3d``), 1/4-res aux depth head (``decoders1``)
  and mono-feature fusion head (``decoders2``) — reference
  ``models/test_models.py:61-205``.

The frozen mono network is NOT a submodule: callers run UniFuse first
(with ``stop_gradient``) and pass its outputs in.  This keeps the MVS
parameter tree clean for optimizers and checkpointing (the reference instead
buries a frozen ``d_net`` inside the checkpoint, ``pipeline3_model.py:
143-147``).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from panogrf_tpu.core.sphere import SphereConvention, get_convention
from panogrf_tpu.models.unifuse import Equi
from panogrf_tpu.nn.blocks import ConvBlock2, UNet3D, resize_linear

Array = jax.Array


def magnet_k_list(n_samples: int, sampling_range: float) -> np.ndarray:
    """Static MaGNet k-list (reference ``pipeline3_model.py:537-545``).

    Probability mass ``erf(beta/sqrt(2))`` is split into ``n_samples`` equal
    bins; k values are the normal quantiles at bin midpoints.
    """
    from statistics import NormalDist
    p_total = math.erf(sampling_range / math.sqrt(2.0))
    idx = np.arange(0, n_samples + 1, dtype=np.float64)
    p = (1.0 - p_total) / 2.0 + (idx / n_samples) * p_total
    k = np.asarray([NormalDist().inv_cdf(float(x)) for x in p])
    return ((k[1:] + k[:-1]) / 2.0).astype(np.float32)


def build_depth_hypotheses(ref_mu: Array, k_list: Sequence[float],
                           num_total: int, min_depth: float, max_depth: float,
                           sigma: Array | float = 0.5,
                           uniform_in_depth: bool = True) -> Array:
    """Per-pixel sorted depth hypotheses (B, D, H, W).

    ``ref_mu`` (B, H, W, 1) mono depth; ``sigma`` a float (fixed_sigma) or a
    (B, H, W, 1) predicted std.  ``num_total - len(k_list)`` global
    hypotheses are spaced uniformly in depth (``use_depth_sampling=True``,
    the shipped config) or inverse depth.  Sorting along D matters: the
    reference notes it prevents overfitting to the mono hypotheses
    (``pipeline3_model.py:815``).
    """
    mu = ref_mu[..., 0]  # (B, H, W)
    if isinstance(sigma, (int, float)):
        sig = jnp.full_like(mu, float(sigma))
    else:
        sig = sigma[..., 0]
    ks = jnp.asarray(np.asarray(k_list, np.float32))
    mono = mu[:, None] + ks[None, :, None, None] * sig[:, None]
    mono = jnp.clip(mono, min_depth, max_depth)  # (B, Ns, H, W)

    n_uniform = num_total - len(k_list)
    if uniform_in_depth:
        centers = jnp.linspace(min_depth, max_depth, n_uniform)
    else:
        centers = 1.0 / jnp.linspace(1.0 / min_depth, 1.0 / max_depth,
                                     n_uniform)
    b, _, h, w = mono.shape
    glob = jnp.broadcast_to(centers[None, :, None, None],
                            (b, n_uniform, h, w))
    vol = jnp.concatenate([mono, glob], axis=1)
    return jnp.sort(vol, axis=1)


class MVSDepthModel(nn.Module):
    """Spherical MVS: features -> sweep -> 3D UNet -> depth heads.

    Input layout matches the reference two-view protocol: view 0 = source,
    view 1 = reference (``models/spherical_cost_volume.py:262-264``).
    """
    convention_name: str = "m3d"
    min_depth: float = 0.1
    max_depth: float = 10.0
    num_hypotheses: int = 64          # cost_volume_channels
    magnet_num_samples: int = 5       # N_s (0 disables mono hypotheses)
    magnet_sampling_range: float = 3.0
    fixed_sigma: float = 0.5
    mono_uncertainty: bool = False
    basic_sigma: float = 0.01
    uniform_in_depth: bool = True     # use_depth_sampling
    group_num: int = 1                # group-wise cost (G)
    mvs_uncertainty: bool = False
    wrap: bool = True
    with_sin: bool = False
    wo_mono_feat: bool = False
    cnn3d_base: int = 32
    use_new_reg3dnet: bool = False    # MVSNet CostRegNet instead of UNet3D
    # cross-replica SyncBN axis for shard_map data parallelism (feature
    # net + CostRegNet BatchNorms; see ``nn/resnet.py`` module docstring)
    bn_axis: str | None = None
    # feature-net choice (reference ``net`` knob,
    # ``models/test_models.py:14-19`` Net_dict): 'Equi' (shipped configs)
    # or the ablation encoders 'ERP+TP' / 'TP' / 'Cube' — all return
    # 1/4-res 32-ch features (the reference variants return exactly that,
    # e.g. ``my_erp_tp.py:272``)
    feature_net_type: str = "Equi"
    nrows: int = 4                    # ERP+TP / TP patch layout
    patch_size: int = 64

    @property
    def convention(self) -> SphereConvention:
        return get_convention(self.convention_name)

    @nn.compact
    def __call__(self, panos: Array, rots: Array, trans: Array,
                 mono_depth: Array, mono_feat: Array | None = None,
                 mono_sigma: Array | None = None,
                 train: bool = False) -> dict:
        """
        :param panos: (B, V, H, W, 3) raw RGB in [0, 1]; V=2: [src, ref].
        :param rots:  (B, V, 3, 3) world-to-camera rotations.
        :param trans: (B, V, 3) world-to-camera translations.
        :param mono_depth: (B, hm, wm, 1) frozen mono depth of the ref view.
        :param mono_feat: (B, h2, w2, C) frozen mono features of the ref
            view (``x_d3``); required unless ``wo_mono_feat``.
        :param mono_sigma: optional (B, hm, wm, 1) mono std.
        :return: dict with ``depth`` (B, H, W, 1), ``rectified_depth_d1``,
            ``cost_reg`` (B, D, H/4, W/4), ``mono_depth_ref`` and, with
            ``mvs_uncertainty``, ``pred_final`` (B, H, W, 2).
        """
        b, v, h, w, _ = panos.shape
        assert v >= 2
        h4, w4 = h // 4, w // 4
        conv = self.convention

        # --- feature extraction (all views share the Equi net) ------------
        flat = panos.reshape(b * v, h, w, 3)
        if self.feature_net_type == "Equi":
            feats = Equi(wrap=self.wrap, with_sin=self.with_sin,
                         bn_axis=self.bn_axis,
                         name="feature_net")(flat, train)
        else:
            from panogrf_tpu.nn.erp_tp import ENCODERS
            enc_cls = ENCODERS[self.feature_net_type]
            kw = ({"nrows": self.nrows, "patch_size": self.patch_size}
                  if self.feature_net_type in ("ERP+TP", "TP") else {})
            if self.feature_net_type == "ERP+TP":
                kw["wrap"] = self.wrap
            feats = enc_cls(out_dim=32, name="feature_net",
                            **kw)(flat, train)
        cdim = feats.shape[-1]
        feats = feats.reshape(b, v, h4, w4, cdim)
        src_feats, ref_feats = feats[:, 0], feats[:, 1]

        # --- depth hypotheses ---------------------------------------------
        mu4 = resize_linear(mono_depth, (h4, w4), axes=(1, 2))
        if self.magnet_num_samples > 0:
            ks = magnet_k_list(self.magnet_num_samples,
                               self.magnet_sampling_range)
            if mono_sigma is not None:
                sig4 = resize_linear(mono_sigma, (h4, w4), axes=(1, 2))
                sigma = jnp.maximum(sig4, self.basic_sigma)
            else:
                sigma = self.fixed_sigma
            dvol = build_depth_hypotheses(
                mu4, ks, self.num_hypotheses, self.min_depth, self.max_depth,
                sigma, self.uniform_in_depth)
        else:
            dvol = build_depth_hypotheses(
                mu4, [], self.num_hypotheses, self.min_depth, self.max_depth,
                self.fixed_sigma, self.uniform_in_depth)

        # --- spherical sweep, averaged over source views -------------------
        from panogrf_tpu.ops.cost_volume import spherical_sweep_cost

        def pair_cost(ref_f, src_f, dv, rot, tr, src_idx):
            return spherical_sweep_cost(ref_f, src_f, dv, rot[1], tr[1],
                                        rot[src_idx], tr[src_idx], conv)

        costs = []
        for si in [i for i in range(v) if i != 1]:
            costs.append(jax.vmap(
                lambda rf, sf, dv, rot, tr: pair_cost(rf, sf, dv, rot, tr, si)
            )(ref_feats, feats[:, si], dvol, rots, trans))
        cost = sum(costs) / len(costs)          # (B, D, H4, W4, C)

        if self.group_num > 1:
            g = self.group_num
            d = cost.shape[1]
            cost = cost.reshape(b, d, h4, w4, g, cdim // g).mean(axis=-1)

        # --- 3D regularization ---------------------------------------------
        if self.use_new_reg3dnet:
            # MVSNet-style CostRegNet (reference ``use_new_reg3dnet``,
            # models/cost_reg.py:99-174)
            from panogrf_tpu.nn.blocks import CostRegNet
            reg = CostRegNet(wrap=self.wrap, bn_axis=self.bn_axis,
                             name="reg3dnet")(cost, train)
        else:
            reg = UNet3D(base_features=self.cnn3d_base, num_layers=3,
                         out_features=1, wrap=self.wrap, name="unet3d")(cost)
        cost_reg = reg[..., 0]                   # (B, D, H4, W4)

        # --- aux 1/4-res depth head (decoders1) ----------------------------
        cost_ch_last = jnp.transpose(cost_reg, (0, 2, 3, 1))  # (B,H4,W4,D)
        d1 = nn.Conv(1, (1, 1), name="decoders1")(cost_ch_last)
        d1 = resize_linear(d1, (h, w), axes=(1, 2))
        rectified_depth_d1 = jnp.maximum(d1, 0.0)

        # --- full-res head with mono-feature fusion (decoders2) ------------
        if self.wo_mono_feat or mono_feat is None:
            head_in = cost_ch_last
        else:
            x_d3 = resize_linear(mono_feat, (h4, w4), axes=(1, 2))
            head_in = jnp.concatenate([cost_ch_last, x_d3], axis=-1)
        if self.with_sin:
            phi = jnp.sin((jnp.arange(h4, dtype=jnp.float32) + 0.5)
                          * math.pi / h4)
            head_in = jnp.concatenate(
                [head_in, jnp.broadcast_to(phi[None, :, None, None],
                                           (b, h4, w4, 1))], axis=-1)
        out_ch = 2 if self.mvs_uncertainty else 1
        x, _ = ConvBlock2(32, wrap=self.wrap, upscale=True, pool=False,
                          name="decoders2_0")(head_in)
        x, _ = ConvBlock2(16, wrap=self.wrap, upscale=True, pool=False,
                          name="decoders2_1")(x)
        x, _ = ConvBlock2(out_ch, wrap=self.wrap, use_activation=False,
                          pool=False, name="decoders2_2")(x)

        depth = jnp.maximum(x[..., :1], 0.0)
        outputs = {
            "depth": depth,
            "rectified_depth_d1": rectified_depth_d1,
            "cost_reg": cost_reg,
            "mono_depth_ref": mono_depth,
            "depth_volume": dvol,
        }
        if self.mvs_uncertainty:
            sigma = nn.softplus(x[..., 1:]) + 1e-3
            outputs["pred_final"] = jnp.concatenate([depth, sigma], axis=-1)
        return outputs
