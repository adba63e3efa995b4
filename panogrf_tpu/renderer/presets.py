"""Named serving presets for the renderer's operating-point knobs.

The renderer grew ~10 interacting serving flags (fast_gather x stride x
fine-stride x decode-on-map x depth-major x geometry-only x dtype); every
one was individually A/B'd on a trained checkpoint (AB_QUALITY_r3.json),
but the combinatorial matrix is untestable.  This module pins the three
blessed compositions — the only ones the CLIs expose and the tests cover:

* ``exact``   — reference-exact numerics: float32, per-map gathers, the
  per-sample dist-decoder MLPs, full coarse pass.  This is the parity
  configuration (`tools/render.py --preset exact` replaces `--exact`).
  Measured 4.8 s/frame at 512x1024 on one v5e.
* ``serving`` — the shipped quality-neutral point: fast_gather + bf16 +
  depth-major rows + gather stride 4 (fine 16) + decode-on-map + coarse
  RGB head skipped + the LOW-RES COARSE importance pass at f=2 (coarse
  pass on an (H/2, W/2) ray grid, hit-prob upsampled —
  ``full_render.render_image_device``).  Whole-composition A/B: +0.05 dB
  vs serving-without-lowres, +0.06 dB vs bf16-exact (AB_QUALITY_r5.json
  "clr2" vs "serving"/"bf16").  690 ms/frame at 512x1024 on one v5e
  (BENCH_r05 protocol, chunk 256).
* ``turbo``   — the fastest documented point: serving with the coarse
  pass at f=4.  A/B +0.09 dB vs serving-without-lowres
  (AB_QUALITY_r5.json "clr4" — the coarse grid only places fine
  samples, and at f=4 its smoothing is still quality-neutral on the
  A/B scenes).  552 ms/frame.  (The round-4 turbo — fine stride 32 +
  48 fine samples — measured 7.2 PSNR on the r5 trained-ckpt A/B:
  composition-broken, retired; see AB_QUALITY_r5.json "turbo_r4".)

The reference has no equivalent — its renderer exposes raw cfg knobs
(``network/renderer.py:37-66``) and every script re-lists them; here the
blessed points are code, so bench/render/tests can name them.
"""

from __future__ import annotations

PRESETS: dict = {
    "exact": dict(
        fast_gather=False,
        compute_dtype="float32",
        gather_depth_major=False,
        gather_stride=1,
        gather_stride_fine=0,
        decode_on_map=False,
        coarse_geometry_only=False,
    ),
    "serving": dict(
        fast_gather=True,
        compute_dtype="bfloat16",
        gather_depth_major=True,
        gather_stride=4,
        gather_stride_fine=16,
        decode_on_map=True,
        coarse_geometry_only=True,
    ),
    # turbo shares serving's model flags; the presets differ only in the
    # render-path coarse_lowres factor below.  (The round-4 turbo's
    # fine-stride-32 + 48-fine-samples composition measured 7.2 PSNR on
    # the round-5 trained-checkpoint A/B — retired.)
    "turbo": dict(
        fast_gather=True,
        compute_dtype="bfloat16",
        gather_depth_major=True,
        gather_stride=4,
        gather_stride_fine=16,
        decode_on_map=True,
        coarse_geometry_only=True,
    ),
}

# the chunk size each preset was swept at (rays per jitted chunk); the
# optimum moves DOWN each time the pipeline slims (r2: 128, r4: 512,
# r5 with lowres coarse: 256 — sweep serving 128/256/512/1024/2048 =
# 803/690/714/721/787 ms, turbo 128/256/512 = 671/552/577 ms)
PRESET_CHUNK = {"exact": 128, "serving": 256, "turbo": 256}

# ray-chunk size for the LOWRES COARSE pass only (0 = same as
# PRESET_CHUNK).  Bit-exact blocking: the lowres grid has 1/f^2 the
# rays, so a larger coarse chunk re-batches the coarse agg's
# latency-bound matmuls without moving the fine pass off its optimum.
# Swept on the v5e (serving, chunk 256): 512 -> 692 ms (= baseline),
# 4096 -> 769 ms, 1024/2048 pathological XLA compiles -- a measured
# no-op (the f=2 coarse share is too small to re-batch), kept at 0.
PRESET_COARSE_CHUNK = {"exact": 0, "serving": 0, "turbo": 0}

# RENDER-path knobs (args of full_render.render_image_device, not
# renderer constructor kwargs): the low-res coarse importance factor.
# f=2 cuts the coarse pass's ~80% share of the 83.9M gather rows 4x
# (1237 -> 690 ms/frame at the re-swept chunk); f=4 cuts it 16x (552 ms).  Trained-ckpt A/B:
# AB_QUALITY_r5.json clr2/clr4 (both >= serving quality).
PRESET_COARSE_LOWRES = {"exact": 1, "serving": 2, "turbo": 4}


def preset_kwargs(name: str, **overrides) -> dict:
    """Renderer kwargs for a named preset, with explicit overrides.

    Overrides whose value is ``None`` are dropped (convenient for CLI
    args that default to None = "use the preset value").
    """
    if name not in PRESETS:
        raise ValueError(f"unknown preset {name!r}; "
                         f"choose from {sorted(PRESETS)}")
    kw = dict(PRESETS[name])
    for k, v in overrides.items():
        if v is not None:
            kw[k] = v
    return kw
