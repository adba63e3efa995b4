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
  RGB head skipped.  Whole-composition A/B: -0.03 dB vs bf16-exact
  (AB_QUALITY_r3.json "serving").  1.31 s/frame.
* ``turbo``   — the fastest documented point that is still a usable
  image: serving + coarse stride 8 + fine stride 32 + 48 fine samples.
  Each axis is individually ~-0.3 dB on the A/B (dmap_s8f8, dmap_s4f32);
  the composition is A/B'd as "turbo" in tools/ab_quality.py.

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
    "turbo": dict(
        fast_gather=True,
        compute_dtype="bfloat16",
        gather_depth_major=True,
        gather_stride=8,
        gather_stride_fine=32,
        decode_on_map=True,
        coarse_geometry_only=True,
        fine_depth_sample_num=48,
    ),
}

# the chunk size each preset was swept at (rays per jitted chunk);
# see bench.py chunk-sweep notes
PRESET_CHUNK = {"exact": 128, "serving": 512, "turbo": 512}


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
