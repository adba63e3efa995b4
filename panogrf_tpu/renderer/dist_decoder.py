"""Mixture-of-logistics visibility/hit-probability decoder (Flax).

Reference ``network/dist_decoder.py:53-152`` (MixtureLogisticsDistDecoder):
four small MLPs map per-sample ray features to a 2-component logistic
mixture over normalized inverse depth; ``compute_prob`` converts a projected
sample depth + interval into (alpha logit, visibility, hit probability) via
the tanh-CDF at ``dist_decoder.py:127-140``.

The shipped renderer configs set ``use_vis: false`` for both coarse and fine
decoders (``configs/train/gen_hr_1.0/...yaml``), so ``use_vis`` defaults off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


def get_near_far_intervals_ref(depth: Array, interval: Array,
                               depth_range: Array) -> tuple:
    """Per-sample [near, far) bins in normalized inverse depth, ref mode.

    Reference ``network/dist_decoder.py:6-51`` with ``is_ref=True`` — in
    POINT-MAJOR layout: depth (qn, rn, dn, rfn) projected depths; interval
    (qn, rn, dn); depth_range (rfn, 2).
    """
    near_inv = -1.0 / depth_range[:, 0]            # (rfn,)
    far_inv = -1.0 / depth_range[:, 1]
    d = jnp.maximum(depth, 1e-5)
    d = (-1.0 / d - near_inv) / (far_inv - near_inv)
    half = interval / 2.0                          # (qn, rn, dn)
    half_ext = jnp.concatenate([half[..., 0:1], half], axis=-1)
    near = d - half_ext[..., :-1, None]
    far = d + half_ext[..., 1:, None]
    return near, far


def get_near_far_intervals_ref_dm(depth: Array, interval: Array,
                                  depth_range: Array) -> tuple:
    """Depth-major ('dnr') twin of :func:`get_near_far_intervals_ref`:
    ``depth`` is (qn, dn, rn, rfn) and ``interval`` stays ray-major
    (qn, rn, dn) — only the 1-channel half-interval gets transposed.
    Same math, same values, different memory order."""
    near_inv = -1.0 / depth_range[:, 0]            # (rfn,)
    far_inv = -1.0 / depth_range[:, 1]
    d = jnp.maximum(depth, 1e-5)
    d = (-1.0 / d - near_inv) / (far_inv - near_inv)
    half = interval / 2.0                          # (qn, rn, dn)
    half_ext = jnp.concatenate([half[..., 0:1], half], axis=-1)
    lo = jnp.swapaxes(half_ext[..., :-1], 1, 2)    # (qn, dn, rn)
    hi = jnp.swapaxes(half_ext[..., 1:], 1, 2)
    return d - lo[..., None], d + hi[..., None]


def get_near_far_intervals_que(depth: Array, interval: Array,
                               depth_range: Array) -> tuple:
    """Query-ray mode (is_ref=False): bins from midpoints between samples."""
    near_inv = -1.0 / depth_range[:, 0][:, None, None]
    far_inv = -1.0 / depth_range[:, 1][:, None, None]
    d = jnp.maximum(depth, 1e-5)
    d = (-1.0 / d - near_inv) / (far_inv - near_inv)
    half = interval / 2.0
    first = d[..., 0] - half[..., 0]
    last = d[..., -1] + half[..., -1]
    mid = (d[..., :-1] + d[..., 1:]) / 2.0
    ext = jnp.concatenate([first[..., None], mid, last[..., None]], axis=-1)
    return ext[..., :-1], ext[..., 1:]


class _MLPHead(nn.Module):
    """3-layer head; on TPU routes through the fused Pallas mlp3 kernel."""
    out_dim: int
    hidden: int
    final: str  # 'softplus' | 'sigmoid' | 'none'
    bias_val: float = 0.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        din = x.shape[-1]
        dims = [(din, self.hidden), (self.hidden, self.hidden),
                (self.hidden, self.out_dim)]
        ws = []
        for i, (a, b) in enumerate(dims):
            ws.append((self.param(f"w{i}", nn.initializers.lecun_normal(),
                                  (a, b)).astype(x.dtype),
                       self.param(f"b{i}", nn.initializers.zeros,
                                  (b,)).astype(x.dtype)))
        # NOTE: a fused Pallas mlp3 was measured SLOWER here (10ms vs 4.4ms
        # per chunk): the four 32-wide heads pad to 128 lanes each, while
        # XLA fuses them sharing the input read.  Keep the XLA path.
        h = nn.elu(x @ ws[0][0] + ws[0][1])
        h = nn.elu(h @ ws[1][0] + ws[1][1])
        h = h @ ws[2][0] + ws[2][1]
        if self.final == "softplus":
            h = nn.softplus(h)
        elif self.final == "sigmoid":
            h = nn.sigmoid(h)
        return h + self.bias_val


class MixtureLogisticsDistDecoder(nn.Module):
    """ray_feats (..., F) -> (mean (...,2), var (...,2), vis (...,1)|None,
    aw (...,1))."""
    feats_dim: int = 32
    bias_val: float = 0.05
    use_vis: bool = False

    def setup(self):
        self.mean_decoder = _MLPHead(2, self.feats_dim, "softplus")
        self.var_decoder = _MLPHead(2, self.feats_dim, "softplus",
                                    self.bias_val)
        self.aw_decoder = _MLPHead(1, self.feats_dim, "sigmoid")
        if self.use_vis:
            self.vis_decoder = _MLPHead(1, self.feats_dim, "sigmoid")

    def __call__(self, feats: Array) -> tuple:
        mean = self.mean_decoder(feats)
        var = self.var_decoder(feats)
        aw = self.aw_decoder(feats)
        vis = self.vis_decoder(feats) if self.use_vis else None
        return mean, var, vis, aw

    def predict_mean(self, feats: Array) -> Array:
        """Expected-depth head used by the depth loss (reference
        ``renderer.py:731-775``)."""
        return self.mean_decoder(feats)


def compute_prob(near: Array, far: Array, mean: Array, var: Array,
                 vis: Array | None, aw: Array, use_vis: bool) -> tuple:
    """Logistic-mixture CDF -> (alpha logit, visibility, hit prob).

    Reference ``network/dist_decoder.py:109-140``.  ``near``/``far`` are the
    per-sample bins in normalized inverse depth, shapes broadcastable with
    ``mean``/``var`` (..., 2).
    """
    mix = jnp.concatenate([aw, 1.0 - aw], axis=-1)
    near = near[..., None]
    far = far[..., None]

    # Fold every dim past (qn, rn) into the lane axis: the natural
    # (..., dn, rfn, 2) layout leaves 2-wide minor dims that waste VPU
    # lanes; one contiguous reshape (free) makes the tanh/mul chain run on
    # dn*rfn*2-wide rows.
    lead = near.shape[:2]

    def fold(t):
        return jnp.broadcast_to(t, jnp.broadcast_shapes(near.shape,
                                                        mean.shape)
                                ).reshape(*lead, -1)

    nearf, farf, meanf, varf, mixf = (fold(t) for t in
                                      (near, far, mean, var, mix))
    cdf0 = 0.5 + 0.5 * jnp.tanh((nearf - meanf) * varf)
    cdf1 = 0.5 + 0.5 * jnp.tanh((farf - meanf) * varf)
    if use_vis and vis is not None:
        visf = fold(jnp.broadcast_to(vis, mean.shape))
        cdf0 = cdf0 * visf
        cdf1 = cdf1 * visf
    out_shape = jnp.broadcast_shapes(near.shape, mean.shape)
    visibility = jnp.sum(((1.0 - cdf0) * mixf).reshape(out_shape), axis=-1)
    hit_prob = jnp.sum(((cdf1 - cdf0) * mixf).reshape(out_shape), axis=-1)
    eps = 1e-5
    alpha = jnp.log(hit_prob / (visibility - hit_prob + eps) + eps)
    return alpha, visibility, hit_prob
