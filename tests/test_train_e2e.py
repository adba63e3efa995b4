"""End-to-end training smoke: renderer loss decreases on synthetic scenes.

This is the integration test the reference never had (SURVEY §4): a full
Trainer step loop over procedurally generated, photo-consistent panoramas,
checking the optimization actually makes progress.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panogrf_tpu.data import synthetic, imgs_info
from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
from panogrf_tpu.train.trainer import Trainer, TrainerConfig

H, W = 32, 64
DH, DW = 16, 32


def _data_stream(n, rn=64, seed0=0):
    scene = synthetic.SphereScene.random(7)
    samples = []
    rng = np.random.default_rng(11)
    # Two fixed samples re-used round-robin: keeps compile count at 1 and
    # lets the model overfit quickly.
    for seed in range(2):
        s = synthetic.make_three_view_sample(scene, H, W, m3d_dist=0.3,
                                             seed=seed)
        coords = imgs_info.sample_train_coords(rng, H, W, rn)
        data = imgs_info.build_render_sample(s, coords,
                                             render_depth_range=(0.5, 15.0))
        # use GT depth as the (frozen) 'mvs depth' input at depth res
        d = s["depth_panos"][jnp.asarray(imgs_info.REF_IDS)]
        data["ref_imgs_info"]["mvs_depth"] = jax.image.resize(
            d, (2, DH, DW, 1), "bilinear")
        samples.append(data)
    for i in range(n):
        yield samples[i % 2]


@pytest.mark.slow
def test_renderer_training_reduces_loss():
    model = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                 depth_sample_num=8, fine_depth_sample_num=8)
    first = next(_data_stream(1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), first)

    cfg = TrainerConfig(total_step=60, val_interval=10**9,
                        save_interval=10**9, losses=("render",),
                        log_interval=10,
                        lr_cfg={"lr_init": 5e-4, "decay_step": 10**9,
                                "decay_rate": 0.5})

    def apply_fn(p, batch, rng):
        return model.apply(p, batch, rng=rng)

    logs = []
    trainer = Trainer(apply_fn, params, cfg,
                      log_fn=lambda s, m: logs.append((s, m)))
    trainer.fit(_data_stream(60))
    first_loss = logs[0][1]["loss"]
    last_loss = logs[-1][1]["loss"]
    assert last_loss < first_loss * 0.8, (first_loss, last_loss)


def test_count_jitter_variants_share_one_param_tree():
    """Count-robust recipe (trainer dict-apply path): the same param tree
    trains under several static fine sample counts, one jitted step per
    count, chosen per step.  Counts only change traced shapes (pos table,
    attention token count) — never the parameter tree — so any listed
    count can serve the resulting checkpoint."""
    model64 = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                   depth_sample_num=8,
                                   fine_depth_sample_num=8)
    model32 = NeuralRayGenRenderer(height=H, width=W, depth_hw=(DH, DW),
                                   depth_sample_num=8,
                                   fine_depth_sample_num=4)
    first = next(_data_stream(1))
    params = jax.jit(model64.init)(jax.random.PRNGKey(0), first)
    # param tree is count-independent
    p32 = jax.jit(model32.init)(jax.random.PRNGKey(0), first)
    assert jax.tree.structure(params) == jax.tree.structure(p32)

    cfg = TrainerConfig(total_step=6, val_interval=10**9,
                        save_interval=10**9, losses=("render",),
                        log_interval=1,
                        lr_cfg={"lr_init": 5e-4, "decay_step": 10**9,
                                "decay_rate": 0.5})
    trainer = Trainer(
        {"f8": lambda p, b, r: model64.apply(p, b, rng=r),
         "f4": lambda p, b, r: model32.apply(p, b, rng=r)},
        params, cfg)
    assert set(trainer.train_steps) == {"f8", "f4"}
    trainer.fit(_data_stream(6))
    leaves0 = jax.tree.leaves(params)
    leaves1 = jax.tree.leaves(trainer.state.params)
    assert any(bool(jnp.any(a != b)) for a, b in zip(leaves0, leaves1))
    # both serve-time counts apply the trained tree
    for m in (model64, model32):
        out = m.apply(trainer.state.params, first,
                      rng=jax.random.PRNGKey(1))
        assert "pixel_colors_nr_fine" in out


def test_train_renderer_cli_count_jitter(tmp_path, monkeypatch, capsys):
    """`tools/train_renderer.py --count-jitter 8,8,4` drives the
    count-robust recipe from the production CLI (one ckpt, weighted
    per-step fine-count draw) — not just from the ab_quality harness."""
    import importlib.util
    import sys
    from pathlib import Path
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(
        "name: jitter_e2e\nheight: 32\nwidth: 64\ndepth_height: 16\n"
        "depth_width: 32\ndepth_sample_num: 8\nfine_depth_sample_num: 8\n"
        "total_step: 3\nval_interval: 1000000\nsave_interval: 1000000\n"
        f"save_dir: {tmp_path}/model\n")
    path = Path(__file__).resolve().parent.parent / "tools" / \
        "train_renderer.py"
    spec = importlib.util.spec_from_file_location("train_renderer", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "train_renderer.py", "--cfg", str(cfg), "--steps", "3",
        "--pool", "2", "--cpu", "--count-jitter", "8,8,4"])
    mod.main()
    assert (tmp_path / "model" / "jitter_e2e" / "latest").exists()
    out = capsys.readouterr().out
    assert "count-jitter training" in out
    assert "'f8': 2" in out and "'f4': 1" in out
