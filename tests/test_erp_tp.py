"""ERP+TP / TP-only / Cube-only encoder tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panogrf_tpu.nn.erp_tp import ERPTPEncoder, TPOnlyEncoder, CubeOnlyEncoder


def _x(b=1, h=64, w=128):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)


def test_erptp_encoder_shape():
    x = _x()
    mod = ERPTPEncoder(out_dim=32, layers=(1, 1, 1), nrows=3,
                       patch_size=32)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(v, x)
    assert out.shape == (1, 16, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_tp_only_encoder_shape():
    x = _x()
    mod = TPOnlyEncoder(out_dim=16, nrows=3, patch_size=32)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(v, x)
    assert out.shape == (1, 16, 32, 16)


def test_cube_only_encoder_shape():
    x = _x()
    mod = CubeOnlyEncoder(out_dim=16)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(v, x)
    assert out.shape == (1, 16, 32, 16)


def test_renderer_erp_tp_feature_type():
    """local_feature_type / init_net_feature_type = 'ERP+TP' swap the
    renderer's encoders (reference renderer.py:96-104, init_net.py:516)."""
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    H, W, DH, DW = 64, 128, 64, 128
    rng_np = np.random.default_rng(0)
    data = {
        "ref_imgs_info": {
            "imgs": jnp.asarray(rng_np.uniform(size=(2, H, W, 3)),
                                jnp.float32),
            "mvs_depth": jnp.asarray(
                rng_np.uniform(1, 5, size=(2, DH, DW, 1)), jnp.float32),
            "depth_range": jnp.asarray([[0.5, 15.0]] * 2),
            "w2c": jnp.broadcast_to(
                jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
                (2, 3, 4)).at[1, 2, 3].set(0.5),
        },
        "que_imgs_info": {
            "coords": jnp.asarray([[[4.0, 5.0], [10.0, 3.0]]]),
            "c2w": jnp.concatenate([jnp.eye(3),
                                    jnp.asarray([[.1], [0.], [.2]])], 1),
            "depth_range": jnp.asarray([[0.5, 15.0]]),
        },
    }
    model = NeuralRayGenRenderer(
        height=H, width=W, depth_hw=(DH, DW), depth_sample_num=8,
        fine_depth_sample_num=8, local_feature_type="ERP+TP",
        init_net_feature_type="ERP+TP", nrows=3, patch_size=32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    # the dual-branch encoder carries per-level fusion layers (CEE) that
    # the plain ResUNetLight image encoder does not
    img_enc_keys = str(sorted(params["params"]["image_encoder"].keys()))
    assert "CEELayer" in img_enc_keys or "Concat" in img_enc_keys, \
        img_enc_keys
    res_net_keys = str(sorted(params["params"]["init_net"]["res_net"]
                              .keys()))
    assert "CEELayer" in res_net_keys or "Concat" in res_net_keys, \
        res_net_keys
    out = model.apply(params, data)
    assert np.isfinite(np.asarray(out["pixel_colors_nr_fine"])).all()
