"""Uncertainty heads over frozen depth networks.

Reference wrappers (``network/omni_mvsnet/uncert_wrapper.py:46`` UncertWrapper,
``mono_uncert_wrapper.py`` MonoUncertWrapper, ``std_uncert_wrapper.py``):
a frozen base depth network plus a small trainable head predicting the
depth variance, trained with Gaussian NLL against GT depth.  Used to
produce the ``mvs_uncert`` maps consumed by DINER sampling and the
ft-renderer's 3-sigma guidance.

Here the head is an explicit module over the frozen base's outputs (the
base runs under ``stop_gradient`` outside, consistent with
``models/depth_stack.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from panogrf_tpu.nn.blocks import WrapConv, ResidualBlock

Array = jax.Array


class DepthUncertHead(nn.Module):
    """(features, depth) -> per-pixel sigma.

    ``features`` can be the MVS cost features (B, h, w, D) — the reference
    UncertWrapper taps the 64-ch cost volume slice — or mono decoder
    features for the mono variant.
    """
    hidden: int = 32
    wrap: bool = True
    min_sigma: float = 1e-3

    @nn.compact
    def __call__(self, features: Array, depth: Array) -> Array:
        """
        :param features: (B, h, w, C); depth (B, H, W, 1) — resized to the
            feature resolution internally, output at depth resolution.
        :return: sigma (B, H, W, 1), strictly positive.
        """
        from panogrf_tpu.nn.blocks import resize_linear
        bh, bw = depth.shape[1:3]
        d_small = resize_linear(depth, (features.shape[1],
                                        features.shape[2]), axes=(1, 2))
        x = jnp.concatenate([features, d_small], axis=-1)
        x = WrapConv(self.hidden, 3, wrap=self.wrap)(x)
        x = nn.relu(x)
        x = ResidualBlock(self.hidden, wrap=self.wrap)(x)
        x = nn.Conv(1, (1, 1))(x)
        sigma = nn.softplus(x) + self.min_sigma
        return resize_linear(sigma, (bh, bw), axes=(1, 2))


def uncert_nll_loss(depth: Array, sigma: Array, gt: Array,
                    min_depth: float, max_depth: float) -> Array:
    """Gaussian NLL for head training (reference ``uncert_wrapper.py``
    training recipe); depth is stop-gradiented (head-only training)."""
    depth = jax.lax.stop_gradient(depth)
    valid = ((gt > min_depth) & (gt < max_depth)).astype(depth.dtype)
    var = jnp.maximum(sigma ** 2, 1e-6)
    nll = 0.5 * (jnp.log(var) + (gt - depth) ** 2 / var)
    return jnp.sum(nll * valid) / (jnp.sum(valid) + 1e-7)
