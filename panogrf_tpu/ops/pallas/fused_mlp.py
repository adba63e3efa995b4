"""Fused 2-layer MLP Pallas kernel for the per-sample renderer MLPs.

The IBRNet/NeuRay aggregation runs several tiny MLPs (e.g. base_fc:
207->64->32 with ELU, reference ``network/ibrnet.py:253-291``) over
rays*samples*views ~ 1M rows per chunk.  Plain XLA materializes each
intermediate activation in HBM between layers; at these widths the op is
HBM-bound, so fusing both layers in VMEM roughly halves traffic.

Kernel shape rules (see pallas_guide.md): rows are blocked on the sublane
axis; weight matrices are small enough (<=256x128) to sit whole in VMEM.
Feature dims are zero-padded to multiples of 128 by the wrapper — padding
columns multiply against zero weights so results are exact.

The op carries a custom VJP whose backward is plain jnp (training uses it
transparently; the forward kernel is where the serving win is).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _act(x: Array, kind: str) -> Array:
    if kind == "elu":
        # jax.nn.elu uses expm1 which Mosaic can't lower; exp is fine and
        # the max(x, 0) split keeps exp's argument <= 0 (no overflow).
        return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "sigmoid":
        return jax.nn.sigmoid(x)
    if kind == "softplus":
        # numerically stable without log1p (not lowerable in Mosaic)
        return jnp.maximum(x, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(x)))
    if kind == "none":
        return x
    raise ValueError(kind)


def _mlp2_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                 act1: str, act2: str):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = _act(h + b1_ref[:], act1)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = _act(o + b2_ref[:], act2).astype(o_ref.dtype)


def _mlp2_forward(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
                  act1: str, act2: str, block_rows: int) -> Array:
    n, din = x.shape
    dh = w1.shape[1]
    dout = w2.shape[1]
    din_p, dh_p, dout_p = (_round_up(d, 128) for d in (din, dh, dout))
    n_p = _round_up(max(n, 8), block_rows)

    xp = jnp.pad(x, ((0, n_p - n), (0, din_p - din)))
    w1p = jnp.pad(w1, ((0, din_p - din), (0, dh_p - dh)))
    b1p = jnp.pad(b1, (0, dh_p - dh)).reshape(1, dh_p)
    w2p = jnp.pad(w2, ((0, dh_p - dh), (0, dout_p - dout)))
    b2p = jnp.pad(b2, (0, dout_p - dout)).reshape(1, dout_p)

    grid = (n_p // block_rows,)
    out = pl.pallas_call(
        functools.partial(_mlp2_kernel, act1=act1, act2=act2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, din_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din_p, dh_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh_p, dout_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, dout_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, dout_p), x.dtype),
    )(xp, w1p, b1p, w2p, b2p)
    return out[:n, :dout]


def _mlp2_ref(x, w1, b1, w2, b2, act1, act2):
    h = _act(x @ w1 + b1, act1)
    return _act(h @ w2 + b2, act2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def mlp2(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
         act1: str = "elu", act2: str = "elu", block_rows: int = 1024,
         interpret: bool = False) -> Array:
    """Fused x @ w1 + b1 -> act -> @ w2 + b2 -> act.

    :param x: (N, Din); w1 (Din, H); w2 (H, Dout).
    :return: (N, Dout).
    """
    if interpret:
        return _mlp2_ref(x, w1, b1, w2, b2, act1, act2)
    return _mlp2_forward(x, w1, b1, w2, b2, act1, act2, block_rows)


def _fwd(x, w1, b1, w2, b2, act1, act2, block_rows, interpret):
    out = mlp2(x, w1, b1, w2, b2, act1, act2, block_rows, interpret)
    return out, (x, w1, b1, w2, b2)


def _bwd(act1, act2, block_rows, interpret, res, g):
    x, w1, b1, w2, b2 = res
    # Plain jnp backward (XLA fuses this fine for training).
    _, vjp = jax.vjp(lambda x, w1, b1, w2, b2:
                     _mlp2_ref(x, w1, b1, w2, b2, act1, act2),
                     x, w1, b1, w2, b2)
    return vjp(g)


mlp2.defvjp(_fwd, _bwd)


def mlp2_batched(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
                 act1: str = "elu", act2: str = "elu",
                 interpret: bool = False) -> Array:
    """mlp2 over arbitrary leading dims: x (..., Din) -> (..., Dout)."""
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    out = mlp2(flat, w1, b1, w2, b2, act1, act2, 1024, interpret)
    return out.reshape(*lead, w2.shape[1])


# ---------------------------------------------------------------------------
# 3-layer variant (dist-decoder heads / rgb_fc)
# ---------------------------------------------------------------------------

def _mlp3_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 o_ref, *, acts):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = _act(h + b1_ref[:], acts[0])
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    h = _act(h + b2_ref[:], acts[1])
    o = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = _act(o + b3_ref[:], acts[2]).astype(o_ref.dtype)


def _mlp3_ref(x, params, acts):
    for (w, b), a in zip(params, acts):
        x = _act(x @ w + b, a)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def mlp3(x, w1, b1, w2, b2, w3, b3, acts=("elu", "elu", "none"),
         block_rows: int = 1024, interpret: bool = False):
    """Fused 3-layer MLP: x (N, Din) -> (N, Dout)."""
    if interpret:
        return _mlp3_ref(x, [(w1, b1), (w2, b2), (w3, b3)], acts)
    n, din = x.shape
    dh1, dh2, dout = w1.shape[1], w2.shape[1], w3.shape[1]
    dims_p = [_round_up(d, 128) for d in (din, dh1, dh2, dout)]
    n_p = _round_up(max(n, 8), block_rows)
    xp = jnp.pad(x, ((0, n_p - n), (0, dims_p[0] - din)))
    w1p = jnp.pad(w1, ((0, dims_p[0] - din), (0, dims_p[1] - dh1)))
    b1p = jnp.pad(b1, (0, dims_p[1] - dh1)).reshape(1, -1)
    w2p = jnp.pad(w2, ((0, dims_p[1] - dh1), (0, dims_p[2] - dh2)))
    b2p = jnp.pad(b2, (0, dims_p[2] - dh2)).reshape(1, -1)
    w3p = jnp.pad(w3, ((0, dims_p[2] - dh2), (0, dims_p[3] - dout)))
    b3p = jnp.pad(b3, (0, dims_p[3] - dout)).reshape(1, -1)

    grid = (n_p // block_rows,)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp3_kernel, acts=acts),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, dims_p[0]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full((dims_p[0], dims_p[1])), full((1, dims_p[1])),
            full((dims_p[1], dims_p[2])), full((1, dims_p[2])),
            full((dims_p[2], dims_p[3])), full((1, dims_p[3])),
        ],
        out_specs=pl.BlockSpec((block_rows, dims_p[3]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, dims_p[3]), x.dtype),
    )(xp, w1p, b1p, w2p, b2p, w3p, b3p)
    return out[:n, :dout]


def _fwd3(x, w1, b1, w2, b2, w3, b3, acts, block_rows, interpret):
    out = mlp3(x, w1, b1, w2, b2, w3, b3, acts, block_rows, interpret)
    return out, (x, w1, b1, w2, b2, w3, b3)


def _bwd3(acts, block_rows, interpret, res, g):
    x, w1, b1, w2, b2, w3, b3 = res
    _, vjp = jax.vjp(
        lambda x, w1, b1, w2, b2, w3, b3:
        _mlp3_ref(x, [(w1, b1), (w2, b2), (w3, b3)], acts),
        x, w1, b1, w2, b2, w3, b3)
    return vjp(g)


mlp3.defvjp(_fwd3, _bwd3)


def mlp3_batched(x, w1, b1, w2, b2, w3, b3, acts=("elu", "elu", "none"),
                 interpret: bool = False):
    lead = x.shape[:-1]
    out = mlp3(x.reshape(-1, x.shape[-1]), w1, b1, w2, b2, w3, b3, acts,
               1024, interpret)
    return out.reshape(*lead, w3.shape[1])
