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

    def jitted(self) -> Callable:
        """One compiled entry reused across scenes (params close over the
        trace as constants; same shapes -> no retrace)."""
        fn = getattr(self, "_jit_fn", None)
        if fn is None:
            fn = jax.jit(lambda r, s, rw, sw: self(r, s, rw, sw))
            object.__setattr__(self, "_jit_fn", fn)
        return fn


def _load_ckpt_tree(path: str, template: Any, convert_fn) -> Any:
    """Load either an orbax checkpoint dir (in-repo training output,
    ``train/depth_trainer.py::save``) or a torch ``.pt/.pth`` file run
    through the reference-layout converter (``utils/torch_convert.py``)."""
    import pathlib
    p = pathlib.Path(path)
    if p.suffix in (".pt", ".pth", ".tar", ".ckpt"):
        import numpy as np
        import torch
        raw = torch.load(p, map_location="cpu", weights_only=False)
        for k in ("model_state_dict", "state_dict", "model"):
            if isinstance(raw, dict) and k in raw:
                raw = raw[k]
                break
        sd = {k: np.asarray(v) for k, v in raw.items()
              if hasattr(v, "shape")}
        return convert_fn(sd)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(p.absolute(), template)
    except BaseException:
        return ckptr.restore(p.absolute())


def load_depth_stack(mono_ckpt: str | None, mvs_ckpt: str | None = None,
                     mono_hw: tuple = (512, 1024),
                     depth_hw: tuple = (256, 512),
                     wo_stereo: bool = False, max_depth: float = 10.0,
                     mvs_kwargs: dict | None = None,
                     seed: int = 0) -> DepthStack:
    """Build a DepthStack from trained (orbax dir) or converted-torch
    checkpoints — the loading half of reference ``render.py:148-160``
    (which restores ``mono_ckpt``/``mvs_ckpt`` into the renderer's frozen
    init stack).  ``wo_stereo=True`` (or ``mvs_ckpt=None``) skips the MVS
    net entirely.
    """
    from panogrf_tpu.utils import torch_convert as tc
    stack = init_depth_stack(jax.random.PRNGKey(seed), mono_hw=mono_hw,
                             depth_hw=depth_hw,
                             wo_stereo=wo_stereo or mvs_ckpt is None,
                             mvs_kwargs={"max_depth": max_depth,
                                         **(mvs_kwargs or {})})
    if mono_ckpt:
        stack.mono_params = _load_ckpt_tree(mono_ckpt, stack.mono_params,
                                            tc.convert_unifuse)
    if mvs_ckpt and stack.mvs_model is not None:
        stack.mvs_params = _load_ckpt_tree(mvs_ckpt, stack.mvs_params,
                                           tc.convert_mvs)
    return stack


def stack_depth_for_sample(stack_fn: Callable, sample: dict,
                           ref_ids, src_ids=None) -> dict:
    """Run the composed mono(+MVS) stack on a raw scene sample.

    This is the system-level composition the reference drives per scene
    (``network/init_net.py:233-336`` construct_cost_volume_with_src): each
    reference view is paired with a source view and the frozen stack
    predicts its depth — NO ground-truth depth is consumed.

    :param stack_fn: a (jitted) DepthStack call.
    :param sample: dict with ``rgb_panos`` (V, H, W, 3), ``rots``
        (V, 3, 3), ``trans`` (V, 3).
    :param ref_ids: reference view indices.
    :param src_ids: paired source view per reference; default pairs each
        ref with the next one cyclically — for the eval protocol
        refs (0, 2) this reproduces the reference's srcs (2, 0)
        (``data/imgs_info.py`` REF_IDS/SRC_IDS).
    :return: stack outputs (``mvs_depth`` (rfn, dh, dw, 1), ...).
    """
    ref_ids = list(ref_ids)
    if src_ids is None:
        src_ids = [ref_ids[(i + 1) % len(ref_ids)]
                   for i in range(len(ref_ids))]
    src_ids = list(src_ids)
    from panogrf_tpu.data import imgs_info
    w2c = imgs_info.pose_w2c(sample["rots"], sample["trans"])
    imgs = jnp.asarray(sample["rgb_panos"])
    return stack_fn(imgs[jnp.asarray(ref_ids)], imgs[jnp.asarray(src_ids)],
                    w2c[jnp.asarray(ref_ids)], w2c[jnp.asarray(src_ids)])


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
