"""LPIPS (VGG16 backbone) perceptual metric in Flax.

Reference ``eval.py:16,25-27`` scores renders with ``lpips.LPIPS(net='vgg')``
on images scaled to [-1, 1].  This is the same network re-expressed in Flax:

* fixed input normalization (the lpips ``ScalingLayer`` shift/scale
  constants),
* VGG16 conv features tapped at relu1_2 / relu2_2 / relu3_3 / relu4_3 /
  relu5_3,
* per-tap channel-unit-normalization, squared difference, learned 1x1
  non-negative "lin" head, spatial mean, summed over taps.

Weights are NOT bundled (no egress from this box): convert them once from
the torch artifacts with :func:`convert_torch_lpips` (torchvision
``vgg16-*.pth`` state dict + the lpips package's ``weights/v0.1/vgg.pth``
lin weights) and pass the tree to :func:`lpips_fn`.  All plumbing is tested
against randomly initialized weights; scoring CLIs degrade gracefully when
no weight file is supplied.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array

# VGG16 feature config: conv channel widths, 'M' = 2x2 maxpool.  Taps are
# taken just after the ReLU preceding each pool (and the final ReLU).
_VGG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512]

# lpips ScalingLayer constants (shift/scale of RGB in [-1,1] space)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv tower returning the five LPIPS feature taps."""

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        taps = []
        conv_i = 0
        for item in _VGG16:
            if item == "M":
                taps.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
        taps.append(x)
        return taps


class LPIPS(nn.Module):
    """(img0, img1) in [-1, 1], NHWC -> perceptual distance (N,)."""

    @nn.compact
    def __call__(self, img0: Array, img1: Array) -> Array:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(name="vgg")
        f0 = vgg((img0 - shift) / scale)
        f1 = vgg((img1 - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (d.shape[-1],))
            # lpips constrains lin weights >= 0 implicitly (trained so);
            # converted weights are non-negative by construction.
            total = total + jnp.mean(jnp.sum(d * w, -1), axis=(1, 2))
        return total


def convert_torch_lpips(vgg_state: dict, lin_state: dict) -> dict:
    """Build the LPIPS param tree from torch state dicts.

    :param vgg_state: torchvision ``vgg16`` state dict (``features.N.weight``
        / ``.bias``, OIHW) — or an lpips full-model dict with
        ``net.sliceK.N.*`` keys.
    :param lin_state: lpips ``weights/v0.1/vgg.pth`` dict
        (``linK.model.1.weight`` with shape (1, C, 1, 1)).
    :return: flax variables ``{"params": ...}`` for :class:`LPIPS`.
    """
    def t2n(t):
        return np.asarray(getattr(t, "numpy", lambda: t)()
                          if not isinstance(t, np.ndarray) else t)

    # normalize key layout to features.N.*
    feats = {}
    for k, v in vgg_state.items():
        if k.startswith("features."):
            feats[k[len("features."):]] = t2n(v)
        elif ".slice" in k:  # net.slice1.0.weight style
            # slices are consecutive Sequential chunks sharing global indices
            idx = k.split(".")[-2]
            feats[f"{idx}.{k.split('.')[-1]}"] = t2n(v)
    conv_params = {}
    conv_i = 0
    layer_i = 0
    for item in _VGG16:
        if item == "M":
            layer_i += 1  # pool occupies one Sequential slot
            continue
        w = feats[f"{layer_i}.weight"]            # (O, I, kh, kw)
        b = feats[f"{layer_i}.bias"]
        conv_params[f"conv{conv_i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b)}
        conv_i += 1
        layer_i += 2  # conv + relu
    params = {"vgg": conv_params}
    for i in range(5):
        w = t2n(lin_state[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params[f"lin{i}"] = jnp.asarray(w.reshape(-1))
    return {"params": params}


def load_lpips_weights(path: str | Path) -> dict:
    """Load converted flax LPIPS weights (.npz as written by
    :func:`save_lpips_weights`), or convert a torch ``.pth`` pair given a
    directory containing ``vgg16.pth`` + ``lpips_vgg.pth``."""
    path = Path(path)
    if path.suffix == ".npz":
        flat = dict(np.load(path))
        params: dict = {}
        for k, v in flat.items():
            node = params
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(v)
        return {"params": params}
    import torch  # torch (cpu) is available in this image
    if path.is_dir():
        vgg = torch.load(path / "vgg16.pth", map_location="cpu",
                         weights_only=True)
        lin = torch.load(path / "lpips_vgg.pth", map_location="cpu",
                         weights_only=True)
        return convert_torch_lpips(vgg, lin)
    raise ValueError(f"expected .npz file or dir with torch pths: {path}")


def save_lpips_weights(variables: dict, path: str | Path) -> None:
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", variables["params"])
    np.savez(path, **flat)


def lpips_fn(variables: dict) -> Callable[[Array, Array], Array]:
    """Jitted scorer: (gt, pred) NHWC in [0, 1] -> distances (N,).

    Matches the reference call (``eval.py:25-27``): inputs are scaled to
    [-1, 1] before the network.
    """
    model = LPIPS()

    @jax.jit
    def score(gt: Array, pred: Array) -> Array:
        return model.apply(variables, gt * 2.0 - 1.0, pred * 2.0 - 1.0)

    return score
