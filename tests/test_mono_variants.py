"""Mono-net ablation variants (VERDICT r3 item 10) + MVS feature-net knob.

Reference: ``models/my_erp_tp.py:66`` (ERP_TP_Fuse), ``my_cube_only.py``
(Cube), ``my_tp_only.py`` (TP), selected by the ``net`` knob in
``models/test_models.py:14-19``.  The rebuild exposes them twice, like the
reference: as *mono depth* nets in the ``select_mono`` factory (full
decoder + sigmoid head, trainable from ``tools/train_mono.py``) and as
*MVS feature nets* via ``MVSDepthModel.feature_net_type``.
"""

import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panogrf_tpu.models.unifuse import (CubeDepth, ERPTPDepth, MONO_NETS,
                                        select_mono)


def test_mono_factory_names():
    assert set(MONO_NETS) == {"UniFuse", "Equi", "ERP+TP", "Cube"}
    assert isinstance(select_mono({"mono_net": "ERP+TP"}), ERPTPDepth)
    assert isinstance(select_mono({"mono_net": "Cube"}), CubeDepth)


def test_erp_tp_depth_forward(rng):
    equi = jnp.asarray(rng.uniform(size=(1, 64, 128, 3)), jnp.float32)
    m = ERPTPDepth(max_depth=8.0, num_layers=18, nrows=4, patch_size=32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), equi)
    out = m.apply(v, equi)
    assert out["pred_depth"].shape == (1, 64, 128, 1)
    assert out["mono_feat"].shape == (1, 32, 64, 32)     # deconv_1 tap
    d = np.asarray(out["pred_depth"])
    assert np.isfinite(d).all() and (d >= 0).all() and (d <= 8.0).all()


def test_cube_depth_forward(rng):
    equi = jnp.asarray(rng.uniform(size=(1, 64, 128, 3)), jnp.float32)
    cube = jnp.asarray(rng.uniform(size=(1, 6, 32, 32, 3)), jnp.float32)
    m = CubeDepth(max_depth=8.0, num_layers=18, uncertainty=True)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), equi, cube)
    out = m.apply(v, equi, cube)
    assert out["pred_depth"].shape == (1, 64, 128, 1)
    assert out["pred"].shape == (1, 64, 128, 2)          # (mu, sigma)
    assert np.isfinite(np.asarray(out["pred"])).all()
    # no ERP branch: params contain only the cube encoder
    names = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    joined = str([p for p, _ in names])
    assert "cube_encoder" in joined and "equi_encoder" not in joined


def test_mvs_feature_net_knob(rng):
    """MVSDepthModel trains/infers with each ablation feature net
    (reference Net_dict, ``models/test_models.py:14-19``)."""
    from panogrf_tpu.models.mvs import MVSDepthModel
    panos = jnp.asarray(rng.uniform(size=(1, 2, 32, 64, 3)), jnp.float32)
    rots = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
    trans = jnp.zeros((1, 2, 3)).at[0, 0, 2].set(0.3)
    mono = jnp.asarray(rng.uniform(1, 5, size=(1, 32, 64, 1)), jnp.float32)
    feat = jnp.asarray(rng.uniform(size=(1, 16, 32, 32)), jnp.float32)
    for ft in ("Cube", "TP"):
        m = MVSDepthModel(num_hypotheses=8, magnet_num_samples=2,
                          feature_net_type=ft, nrows=3, patch_size=16)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), panos, rots, trans,
                            mono, feat)
        out = m.apply(v, panos, rots, trans, mono, feat)
        assert out["depth"].shape == (1, 32, 64, 1), ft
        assert np.isfinite(np.asarray(out["depth"])).all(), ft


@pytest.mark.slow
def test_train_mono_cli_erp_tp(tmp_path, monkeypatch):
    """``tools/train_mono.py --mono-net ERP+TP`` trains on CPU smoke
    (the VERDICT item's done-bar)."""
    path = Path(__file__).resolve().parent.parent / "tools" / "train_mono.py"
    spec = importlib.util.spec_from_file_location("train_mono", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "train_mono.py", "--steps", "2", "--height", "64", "--width", "128",
        "--batch", "1", "--mono-net", "ERP+TP", "--patch-size", "32",
        "--name", "tm_erp_tp", "--cpu"])
    monkeypatch.chdir(tmp_path)
    mod.main()
    assert (tmp_path / "data/depth_model/tm_erp_tp").exists()
