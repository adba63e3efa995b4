"""Sanity tests for the analytic roofline model (utils/roofline.py)."""

from panogrf_tpu.utils import roofline as rl


def test_pool_flops_scales_linearly():
    a = rl.pool_flops(1000)
    b = rl.pool_flops(2000)
    assert abs(b - 2 * a) / b < 1e-9


def test_geometry_only_is_cheaper():
    assert rl.pool_flops(1000, geometry_only=True) < rl.pool_flops(1000)


def test_frame_model_shape():
    fm = rl.frame_model(512, 1024)
    assert fm["agg_flops"] > 0 and fm["gather_rows"] > 0
    lo, hi = fm["gather_latency_floor_s"]
    assert 0 < lo < hi
    # serving point: 512*1024 rays * (64/4 + 64/16 fetched samples)
    # * 2 views * 4 bilinear taps
    assert fm["gather_rows"] == 512 * 1024 * (16 + 4) * 2 * 4


def test_achieved_fractions():
    fm = rl.frame_model(512, 1024)
    # at the ceiling itself, MFU == 1
    sec_at_peak = fm["agg_flops"] / rl.PEAK_FLOPS["bfloat16"]
    ach = rl.achieved(fm, sec_at_peak, 1.0)
    assert abs(ach["agg_mfu"] - 1.0) < 1e-9
    # measured-scale numbers stay in (0, 1]
    ach = rl.achieved(fm, 0.4, 0.5)
    assert 0 < ach["agg_mfu"] < 1
    assert 0 < ach["gather_hbm_frac"] < 1


def test_stride_cuts_gather_not_agg():
    a = rl.frame_model(256, 512, stride=1, stride_fine=1)
    b = rl.frame_model(256, 512, stride=4, stride_fine=16)
    assert b["gather_rows"] < a["gather_rows"]
    assert b["agg_flops"] == a["agg_flops"]
