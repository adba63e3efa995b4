"""Named serving presets (renderer/presets.py) — VERDICT r3 item 9.

The flag matrix is frozen behind three blessed names (exact / serving /
turbo); these tests pin the compositions and drive the `--preset` CLI
surface so a renamed/retuned knob can't silently drift a blessed point.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

from panogrf_tpu.renderer.presets import (PRESETS, PRESET_CHUNK,
                                          PRESET_COARSE_LOWRES,
                                          preset_kwargs)


def test_preset_names_pinned():
    assert set(PRESETS) == {"exact", "serving", "turbo"}
    assert set(PRESET_CHUNK) == set(PRESETS)
    assert set(PRESET_COARSE_LOWRES) == set(PRESETS)


def test_coarse_lowres_factors_pinned():
    """The blessed low-res coarse factors (AB_QUALITY_r5.json clr2/clr4:
    both quality-neutral on the trained-ckpt A/B; 717/577 ms/frame)."""
    assert PRESET_COARSE_LOWRES == {"exact": 1, "serving": 2, "turbo": 4}


def test_exact_matches_renderer_defaults():
    """`exact` must equal the renderer's constructor defaults — the parity
    configuration is the un-flagged model."""
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    m = NeuralRayGenRenderer(height=8, width=16, depth_hw=(4, 8),
                             **PRESETS["exact"])
    d = NeuralRayGenRenderer(height=8, width=16, depth_hw=(4, 8))
    for k in PRESETS["exact"]:
        assert getattr(m, k) == getattr(d, k), k


def test_serving_composition_pinned():
    """The A/B'd serving point (AB_QUALITY_r3.json "serving", -0.03 dB;
    AB_QUALITY_r5.json "clr2" for the lowres-coarse addition)."""
    assert PRESETS["serving"] == dict(
        fast_gather=True, compute_dtype="bfloat16",
        gather_depth_major=True, gather_stride=4, gather_stride_fine=16,
        decode_on_map=True, coarse_geometry_only=True)
    # turbo = serving model flags; only the render-path lowres factor
    # differs (the round-4 fine-stride-32/f48 turbo was retired after
    # measuring 7.2 PSNR on the r5 trained-ckpt A/B)
    assert PRESETS["turbo"] == PRESETS["serving"]


def test_preset_kwargs_overrides():
    kw = preset_kwargs("serving", gather_stride=8, decode_on_map=None)
    assert kw["gather_stride"] == 8           # explicit override wins
    assert kw["decode_on_map"] is True        # None = keep preset value
    assert kw["compute_dtype"] == "bfloat16"  # untouched keys pass through
    with pytest.raises(ValueError):
        preset_kwargs("warp9")


def test_turbo_builds_and_renders():
    """turbo constructs a renderer and renders a tiny frame end to end
    (float32 on CPU; the dtype is the only per-host override)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
    from panogrf_tpu.renderer import full_render

    H, W, DH, DW = 32, 64, 16, 32
    kw = preset_kwargs("turbo", compute_dtype="float32",
                       depth_sample_num=16, fine_depth_sample_num=16,
                       gather_stride=2, gather_stride_fine=4)
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW), **kw)
    rng = np.random.default_rng(0)
    ref_info = {
        "imgs": jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32),
        "mvs_depth": jnp.asarray(rng.uniform(1, 5, size=(2, DH, DW, 1)),
                                 jnp.float32),
        "depth_range": jnp.asarray([[0.5, 15.0]] * 2),
        "w2c": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
            (2, 3, 4)).at[1, 2, 3].set(0.3),
    }
    data = {"ref_imgs_info": ref_info,
            "que_imgs_info": {"coords": jnp.zeros((1, 8, 2)),
                              "c2w": jnp.concatenate(
                                  [jnp.eye(3),
                                   jnp.asarray([[0.], [0.], [.1]])], 1),
                              "depth_range": jnp.asarray([[0.5, 15.0]])}}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data)
    out = full_render.render_image(
        model, params, ref_info, data["que_imgs_info"]["c2w"],
        data["que_imgs_info"]["depth_range"], chunk=H * W)
    assert out["rgb"].shape == (H, W, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_render_cli_preset(tmp_path, monkeypatch):
    """`tools/render.py --preset turbo` runs end to end and --exact keeps
    aliasing to the exact preset."""
    path = Path(__file__).resolve().parent.parent / "tools" / "render.py"
    spec = importlib.util.spec_from_file_location("render", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "render.py", "--num", "1", "--height", "32", "--width", "64",
        "--depth-height", "16", "--depth-width", "32", "--preset", "turbo",
        "--out", str(tmp_path / "out"), "--cpu"])
    mod.main()
    assert (tmp_path / "out" / "metric.txt").exists()
