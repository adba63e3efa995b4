"""Frozen mono+MVS depth stack feeding the renderer's init net.

Reference ``network/init_net.py:233-376`` (construct_cost_volume_with_src /
construct_monodepth_with_src): for every reference view, run the frozen
UniFuse mono net and the frozen MVS net on the (src, ref) pano pair and
return the predicted depth.  The reference hides both nets inside the
renderer module and re-runs a CPU cube resample per call
(``pipeline3_model.py:266-283``); here the stack is an explicit, jitted,
stop-gradient'ed function over device-resident arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from panogrf_tpu.core import cubemap
from panogrf_tpu.models.unifuse import UniFuse, Equi, normalize_imagenet
from panogrf_tpu.models.mvs import MVSDepthModel
from panogrf_tpu.nn.blocks import resize_linear

Array = jax.Array


def run_mono(mono_model: UniFuse, mono_params: Any, imgs: Array,
             mono_hw: tuple) -> dict:
    """Run UniFuse at its native resolution on a batch of panos.

    :param imgs: (B, H, W, 3) RGB in [0, 1].
    :return: dict with pred_depth (B, mh, mw, 1), mono_feat.
    """
    mh, mw = mono_hw
    x = resize_linear(imgs, (mh, mw), axes=(1, 2))
    equi = normalize_imagenet(x)
    cube = jax.vmap(lambda e: cubemap.equi_to_cube(e, mh // 2))(equi)
    out = mono_model.apply(mono_params, equi, cube)
    return jax.tree.map(jax.lax.stop_gradient, out)


@dataclasses.dataclass
class DepthStack:
    """Composes frozen UniFuse + MVSDepthModel.

    ``wo_stereo=True`` reproduces the reference's mono-only init path
    (``init_net.py:338-376``): the MVS net is skipped and the mono depth is
    resized to the MVS working resolution.
    """
    mono_model: UniFuse
    mono_params: Any
    mvs_model: Optional[MVSDepthModel]
    mvs_params: Any
    mono_hw: tuple = (512, 1024)
    depth_hw: tuple = (256, 512)
    wo_stereo: bool = False

    def __call__(self, ref_imgs: Array, src_imgs: Array, ref_w2c: Array,
                 src_w2c: Array) -> dict:
        """Depth for every reference view.

        :param ref_imgs: (rfn, H, W, 3); src_imgs: (rfn, H, W, 3) — the
            paired source view per reference (reference SRC_IDS protocol).
        :param ref_w2c/src_w2c: (rfn, 3, 4) world-to-camera poses.
        :return: dict with ``mvs_depth`` (rfn, dh, dw, 1) (+ ``mvs_uncert``
            when the MVS net predicts uncertainty).
        """
        dh, dw = self.depth_hw
        mono = run_mono(self.mono_model, self.mono_params, ref_imgs,
                        self.mono_hw)
        if self.wo_stereo or self.mvs_model is None:
            depth = resize_linear(mono["pred_depth"], (dh, dw), axes=(1, 2))
            return {"mvs_depth": jnp.maximum(depth, 0.0)}

        panos_ref = resize_linear(ref_imgs, (dh, dw), axes=(1, 2))
        panos_src = resize_linear(src_imgs, (dh, dw), axes=(1, 2))
        # layout (B, 2, ...) with index 0 = src, 1 = ref (reference
        # ``init_net.py:164-182`` construct_input_data).
        panos = jnp.stack([panos_src, panos_ref], axis=1)
        rots = jnp.stack([src_w2c[:, :, :3], ref_w2c[:, :, :3]], axis=1)
        trans = jnp.stack([src_w2c[:, :, 3], ref_w2c[:, :, 3]], axis=1)

        out = self.mvs_model.apply(
            self.mvs_params, panos, rots, trans, mono["pred_depth"],
            mono.get("mono_feat"))
        out = jax.tree.map(jax.lax.stop_gradient, out)
        ret = {"mvs_depth": jnp.maximum(out["depth"], 0.0),
               "mono_depth": mono["pred_depth"]}
        if "pred_final" in out:
            ret["mvs_uncert"] = out["pred_final"][..., 1:]
        return ret


def init_depth_stack(rng: jax.Array, height: int = 512, width: int = 1024,
                     mono_hw: tuple = (512, 1024),
                     depth_hw: tuple = (256, 512),
                     wo_stereo: bool = False,
                     mvs_kwargs: dict | None = None) -> DepthStack:
    """Random-init a DepthStack (real runs restore converted checkpoints)."""
    mono_model = UniFuse()
    mh, mw = mono_hw
    k1, k2 = jax.random.split(rng)
    dummy = jnp.zeros((1, mh, mw, 3))
    dummy_cube = jnp.zeros((1, 6, mh // 2, mh // 2, 3))
    mono_params = mono_model.init(k1, dummy, dummy_cube)
    mvs_model = None
    mvs_params = None
    if not wo_stereo:
        dh, dw = depth_hw
        mvs_model = MVSDepthModel(**(mvs_kwargs or {}))
        mvs_params = mvs_model.init(
            k2, jnp.zeros((1, 2, dh, dw, 3)),
            jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)),
            jnp.zeros((1, 2, 3)), jnp.zeros((1, mh, mw, 1)),
            jnp.zeros((1, mh // 2, mw // 2, 32)))
    return DepthStack(mono_model, mono_params, mvs_model, mvs_params,
                      mono_hw, depth_hw, wo_stereo)
