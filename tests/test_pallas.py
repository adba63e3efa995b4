"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panogrf_tpu.ops.pallas.fused_mlp import mlp2, mlp2_batched, _mlp2_ref

ON_TPU = jax.devices()[0].platform == "tpu"


def _data(n=300, din=207, dh=64, dout=32, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(n, din)) * 0.3, jnp.float32),
            jnp.asarray(rng.normal(size=(din, dh)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(dh,)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(dh, dout)) * 0.1, jnp.float32),
            jnp.asarray(rng.normal(size=(dout,)) * 0.1, jnp.float32))


def test_mlp2_matches_reference_interpret():
    x, w1, b1, w2, b2 = _data()
    ref = _mlp2_ref(x, w1, b1, w2, b2, "elu", "elu")
    out = mlp2(x, w1, b1, w2, b2, "elu", "elu", 1024, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="compiled pallas path needs TPU")
def test_mlp2_compiled_matches_reference():
    x, w1, b1, w2, b2 = _data(5000)
    ref = _mlp2_ref(x, w1, b1, w2, b2, "elu", "elu")
    out = jax.jit(lambda *a: mlp2(*a))(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_mlp2_grad_matches_reference():
    x, w1, b1, w2, b2 = _data(64, 35, 16, 8)

    def loss_pallas(args):
        return jnp.sum(mlp2(*args, "elu", "none", 1024, True) ** 2)

    def loss_ref(args):
        return jnp.sum(_mlp2_ref(*args, "elu", "none") ** 2)

    g1 = jax.grad(loss_pallas)((x, w1, b1, w2, b2))
    g2 = jax.grad(loss_ref)((x, w1, b1, w2, b2))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_mlp2_batched_shape():
    x, w1, b1, w2, b2 = _data(0)
    xb = jnp.ones((2, 3, 5, 207))
    out = mlp2_batched(xb, w1, b1, w2, b2, interpret=True)
    assert out.shape == (2, 3, 5, 32)
