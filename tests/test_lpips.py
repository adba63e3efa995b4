"""LPIPS plumbing tests (random-init weights; no pretrained VGG in image)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panogrf_tpu.train import lpips as L


@pytest.fixture(scope="module")
def variables():
    model = L.LPIPS()
    x = jnp.zeros((1, 64, 64, 3))
    return model.init(jax.random.PRNGKey(0), x, x)


def test_identical_images_zero(variables):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    score = L.lpips_fn(variables)(img * 0.5 + 0.25, img * 0.5 + 0.25)
    assert score.shape == (2,)
    np.testing.assert_allclose(np.asarray(score), 0.0, atol=1e-6)


def test_different_images_positive(variables):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    s = L.lpips_fn(variables)(a, b)
    assert float(s[0]) > 0.0


def test_torch_conversion_matches_flax_layout(tmp_path, variables):
    """Fabricated torch state dicts convert into the exact param tree."""
    rng = np.random.default_rng(2)
    vgg_state = {}
    layer_i = 0
    widths = []
    in_c = 3
    for item in L._VGG16:
        if item == "M":
            layer_i += 1
            continue
        vgg_state[f"features.{layer_i}.weight"] = rng.normal(
            size=(item, in_c, 3, 3)).astype(np.float32)
        vgg_state[f"features.{layer_i}.bias"] = rng.normal(
            size=(item,)).astype(np.float32)
        widths.append(item)
        in_c = item
        layer_i += 2
    taps = [64, 128, 256, 512, 512]
    lin_state = {f"lin{i}.model.1.weight":
                 np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32)
                 for i, c in enumerate(taps)}
    conv = L.convert_torch_lpips(vgg_state, lin_state)
    # exact tree-shape match with a fresh init
    ref_shapes = jax.tree.map(jnp.shape, variables)
    got_shapes = jax.tree.map(jnp.shape, conv)
    assert ref_shapes == got_shapes
    # and it runs
    img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    s = L.lpips_fn(conv)(img, jnp.clip(img + 0.1, 0, 1))
    assert np.isfinite(float(s[0]))
    # round-trip npz save/load
    L.save_lpips_weights(conv, tmp_path / "w.npz")
    loaded = L.load_lpips_weights(tmp_path / "w.npz")
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b), conv, loaded)
    del chex_equal
