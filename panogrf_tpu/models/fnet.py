"""FNET: single-UNet spherical MVS depth (the reference's third pipeline).

Reference ``network/omni_mvsnet/fnet.py:60-278`` (``FNET``,
``estimate_depth_using_cost_volume_v3_erp``): one shared UNet encodes each
pano to a ``cost_volume_channels``-wide feature map, an ERP backward-warp
cost volume over 64 inverse-uniform depth hypotheses is built with
``abs_diff`` cost (``models/spherical_cost_volume.py`` →
``calculate_cost_volume_erp``), summed over channels, softmaxed over the
depth axis, and the depth is the hypothesis expectation.  There is no 3D
regularisation net — the UNet alone shapes the matching features, which is
what distinguishes this variant from ``MVSDepthModel``
(``models/mvs.py``).

Faithful quirks kept on purpose:

* the softmax runs on the *raw* summed abs-diff response
  (``fnet.py:270-271``) — because the features are learned end to end the
  sign convention is free, so the net learns features whose matching
  response is *large* where views agree;
* hypotheses are inverse-uniform from ``min_depth`` to ``max_depth``
  (``fnet.py:262``: ``1 / linspace(1/min, 1/max, D)``);
* the warped view is index 0, the reference (depth) view index 1
  (``fnet.py:225-228``).

TPU-native divergences (documented, not behavioural gaps): the cube branch
of the reference UNet (``fnet.py:238-244`` feeds equi+cube pairs) is fused
by concatenating the cube→ERP resampled panorama channels at the input
instead of running a second encoder tower, and the sweep warp is the
vectorised ``ops.cost_volume.batched_sweep_cost`` (one gather over all D
hypotheses) rather than a per-depth ``grid_sample`` loop.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from panogrf_tpu.core.sphere import get_convention
from panogrf_tpu.core import cubemap
from panogrf_tpu.nn.blocks import ConvBlock2, WrapConv, resize_linear
from panogrf_tpu.ops.cost_volume import batched_sweep_cost

Array = jax.Array


class FNetUNet(nn.Module):
    """Wrap-padded encoder/decoder UNet (reference ``initialize_unet``,
    ``models/test_models.py`` via ``fnet.py:113-121``: stride-2 encoders
    16→…→16·2^(L-1), skip-concat decoders, final conv to
    ``out_channels``)."""
    layers: int = 5
    base: int = 16
    out_channels: int = 64
    wrap: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        skips = []
        h = x
        for i in range(self.layers):
            h = WrapConv(self.base * (2 ** i), 4, stride=2, wrap=self.wrap,
                         padding=1, name=f"enc{i}")(h)
            h = nn.leaky_relu(h, 0.01)
            skips.append(h)                      # resolution H / 2^(i+1)
        h = None
        for i in reversed(range(self.layers)):
            s = skips[i]
            h = s if h is None else jnp.concatenate([h, s], axis=-1)
            h, _ = ConvBlock2(self.base * (2 ** i), wrap=self.wrap,
                              pool=False, name=f"dec{i}")(h)
            h = resize_linear(h, (h.shape[1] * 2, h.shape[2] * 2),
                              axes=(1, 2), align_corners=False)
        return WrapConv(self.out_channels, 3, wrap=self.wrap,
                        name="final")(h)


class FNetDepthModel(nn.Module):
    """Two-view single-UNet MVS depth (reference ``FNET`` with
    ``cost_volume='v3_erp'``)."""
    convention_name: str = "m3d"
    num_depths: int = 64
    min_depth: float = 0.5
    max_depth: float = 10.0
    layers: int = 5
    cost_volume_channels: int = 64
    use_cube: bool = True
    wrap: bool = True

    @property
    def convention(self):
        return get_convention(self.convention_name)

    def _encode(self, panos: Array) -> Array:
        """(N, H, W, 3) → (N, H, W, C) matching features."""
        x = panos
        if self.use_cube:
            # cube→ERP round trip injects the cube branch's pole-correct
            # view of the scene as extra input channels (see module doc)
            cube = jax.vmap(
                lambda e: cubemap.equi_to_cube(e, e.shape[0] // 2))(panos)
            back = jax.vmap(
                lambda c: cubemap.cube_to_equi(c, panos.shape[1],
                                               panos.shape[2]))(cube)
            x = jnp.concatenate([x, back], axis=-1)
        return FNetUNet(layers=self.layers,
                        out_channels=self.cost_volume_channels,
                        wrap=self.wrap, name="unet")(x)

    @nn.compact
    def __call__(self, panos: Array, rots: Array, trans: Array) -> dict:
        """Estimate the depth of view 1 (the reference view).

        :param panos: (B, 2, H, W, 3) — view 0 is warped into view 1's
            frame (reference ``fnet.py:225-228``).
        :param rots: (B, 2, 3, 3) world-to-camera rotations.
        :param trans: (B, 2, 3) world-to-camera translations.
        :return: dict with ``depth`` (B, H, W, 1) and ``prob``
            (B, D, H, W) the per-hypothesis softmax.
        """
        b, v, h, w, _ = panos.shape
        assert v == 2, "FNET is the two-view variant"
        feats = self._encode(panos.reshape(b * v, h, w, 3))
        feats = feats.reshape(b, v, h, w, -1)

        d_centers = 1.0 / jnp.linspace(1.0 / self.min_depth,
                                       1.0 / self.max_depth,
                                       self.num_depths)
        dv = jnp.broadcast_to(d_centers[:, None, None],
                              (self.num_depths, h, w))
        dv = jnp.broadcast_to(dv[None], (b, self.num_depths, h, w))
        cost = batched_sweep_cost(feats[:, 1], feats[:, 0], dv, rots, trans,
                                  self.convention, cost_type="abs_diff")
        response = jnp.sum(cost, axis=-1)               # (B, D, H, W)
        prob = jax.nn.softmax(response, axis=1)
        depth = jnp.sum(prob * d_centers[None, :, None, None], axis=1)
        depth = jnp.maximum(depth, 0.0)[..., None]
        return {"depth": depth, "prob": prob}
