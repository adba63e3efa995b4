"""Driver contract tests: __graft_entry__ and bench.py."""

import json
import subprocess
import sys

import jax
import pytest


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, (params, data) = ge.entry()
    out = jax.jit(fn)(params, data)
    assert out.shape[-1] == 3


def test_dryrun_multichip_8(eight_devices):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_losses_and_metrics_smoke():
    import jax.numpy as jnp
    import numpy as np
    from panogrf_tpu.train import losses, metrics
    rng = np.random.default_rng(0)
    pr = {
        "pixel_colors_nr": jnp.asarray(rng.uniform(size=(1, 32, 3)),
                                       jnp.float32),
        "pixel_colors_nr_fine": jnp.asarray(rng.uniform(size=(1, 32, 3)),
                                            jnp.float32),
        "pixel_colors_gt": jnp.asarray(rng.uniform(size=(1, 32, 3)),
                                       jnp.float32),
        "ray_mask": jnp.ones((1, 32), bool),
    }
    terms = losses.render_loss(pr, {})
    assert set(terms) == {"loss_rgb_nr", "loss_rgb_nr_fine"}
    total = losses.total_loss(terms)
    assert float(total) > 0

    img = jnp.asarray(rng.uniform(size=(64, 128, 3)), jnp.float32)
    noisy = jnp.clip(img + 0.05 * jnp.asarray(
        rng.normal(size=img.shape), jnp.float32), 0, 1)
    m = metrics.render_metrics(noisy, img)
    assert 20 < float(m["psnr_nr"]) < 40
    assert 0.3 < float(m["ssim_nr"]) <= 1.0
    ident = metrics.render_metrics(img, img)
    assert float(ident["psnr_nr"]) > 80
    assert float(ident["ssim_nr"]) > 0.999

    dm = metrics.depth_metrics_erp(jnp.full((16, 32), 3.0),
                                   jnp.full((16, 32), 3.0))
    assert float(dm["mae"]) < 1e-6 and float(dm["delta1"]) > 0.999


def test_bench_main_json_contract(monkeypatch, capsys):
    """bench.py --no-roofline on CPU emits the driver's one-line JSON
    with the serving number AND the turbo point (turbo_ms_per_frame)."""
    import importlib.util
    from pathlib import Path
    path = Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--no-roofline"])
    mod.main()
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["unit"] == "ms/frame" and rec["value"] > 0
    assert "turbo_ms_per_frame" in rec and rec["turbo_ms_per_frame"] > 0
