"""Analytic FLOPs/bytes roofline model for the serving render pipeline.

Answers "how far from the hardware ceiling is N ms/frame?" — the bench
reports ms/frame and rays/sec, which is only *relative* progress; this
module prices the two dominant stages against the chip:

* the **IBR aggregation** (pool chain + ray attention) is matmul work —
  its ceiling is the MXU peak, and the achieved fraction is MFU;
* the **merged-map gathers** are row-latency-bound (measured ~9-17 ns
  per fetched row on v5e regardless of row width, see
  ``render_ops.project_points_dict``) — their ceiling is row count x
  per-row latency, NOT HBM bandwidth, so we report both the byte-level
  bandwidth fraction (tiny) and the latency-model fraction (the honest
  one).

Peak numbers are the published TPU v5e (v5 lite) specs; override for
other chips.  The reference has no equivalent accounting anywhere (its
only timing is an eval wall-clock print, ``train/train_valid.py:119``).
"""

from __future__ import annotations

from dataclasses import dataclass


# TPU v5e published peaks (per chip)
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 49e12}
PEAK_HBM_BYTES = 819e9
# measured per-row gather latency floor on this box's v5e through the
# tunnel (profile row sweeps, round 2): ~9 ns sequential-ish rows
# (depth-major) to ~17 ns scattered
GATHER_NS_PER_ROW = (9.0, 17.0)


def _mm(m: int, k: int, n: int) -> int:
    """FLOPs of an (m,k)@(k,n) matmul (mul+add)."""
    return 2 * m * k * n


@dataclass
class StageCost:
    flops: int
    hbm_bytes: int

    def __add__(self, o: "StageCost") -> "StageCost":
        return StageCost(self.flops + o.flops, self.hbm_bytes + o.hbm_bytes)


def pool_flops(n_points: int, v: int = 2, f: int = 35, nd: int = 32,
               geometry_only: bool = False) -> int:
    """Matmul FLOPs of ``agg_net.pool_reference`` + the prob embed for
    ``n_points`` (ray, sample) points across ``v`` views.

    Mirrors the shipped row-block-split formulation: base_fc layer 0 runs
    the per-point [mean|var|mean|var] half once per point and the
    per-view [rgbf|neuray] half per view.
    """
    N, pv = n_points, n_points * v
    fl = 0
    # prob_embed: (nd+2 -> nd -> nd) per (point, view)
    fl += _mm(pv, nd + 2, nd) + _mm(pv, nd, nd)
    # ray_dir_fc: (4 -> 16 -> f)
    fl += _mm(pv, 4, 16) + _mm(pv, 16, f)
    # neuray_fc: (nd -> 8 -> 1)
    fl += _mm(pv, nd, 8) + _mm(pv, 8, 1)
    # base_fc layer 0 split: per-point (4f -> 64) + per-view (f+nd -> 64)
    fl += _mm(N, 4 * f, 64) + _mm(pv, f + nd, 64)
    fl += _mm(pv, 64, 32)                      # base_fc layer 1
    # vis_fc (32->32->33), vis_fc2 (32->32->1)
    fl += _mm(pv, 32, 32) + _mm(pv, 32, 33)
    fl += _mm(pv, 32, 32) + _mm(pv, 32, 1)
    # geometry_fc per point (65 -> 64 -> 16)
    fl += _mm(N, 65, 64) + _mm(N, 64, 16)
    if not geometry_only:
        # rgb_fc per view (37 -> 16 -> 8 -> 1)
        fl += _mm(pv, 37, 16) + _mm(pv, 16, 8) + _mm(pv, 8, 1)
    return fl


def attention_flops(n_rays: int, dn: int, d_model: int = 16,
                    n_head: int = 4, d_k: int = 4) -> int:
    """Ray attention + sigma head FLOPs (``agg_net.MultiHeadAttention`` +
    out_geometry_fc) for ``n_rays`` rays of ``dn`` samples."""
    tok = n_rays * dn
    fl = _mm(tok, d_model, 3 * n_head * d_k)          # fused qkv
    fl += 2 * (2 * n_rays * n_head * dn * dn * d_k)   # scores + out
    fl += _mm(tok, n_head * d_k, d_model)             # fc
    fl += _mm(tok, 16, 16) + _mm(tok, 16, 1)          # sigma head
    return fl


def agg_stage(n_rays: int, dn: int, v: int = 2, f: int = 35, nd: int = 32,
              geometry_only: bool = False,
              dtype_bytes: int = 2) -> StageCost:
    """One aggregation pass (pool + attention) over n_rays x dn points.

    HBM bytes: the pass's unavoidable traffic is its INPUTS (the gathered
    per-view rows) + outputs; intermediates stay fused in VMEM at serving
    chunk sizes (measured — see ``pool_reference`` docstring).  Input
    row channels: rgb 3 + img_feats 32 + ray_feats 32 + dir 3 + stats 5.
    """
    N = n_rays * dn
    fl = pool_flops(N, v, f, nd, geometry_only) + attention_flops(n_rays, dn)
    in_ch = 3 + 32 + nd + 3 + 5
    bytes_ = N * v * in_ch * dtype_bytes + N * 4 * 4   # + f32 rgb/sigma out
    return StageCost(fl, bytes_)


def gather_stage(n_rays: int, dn: int, stride: int, v: int = 2,
                 row_ch: int = 77, dtype_bytes: int = 2) -> dict:
    """Row count / bytes / latency-model floor for one pass's merged-map
    gathers (``fast_gather``: one bilinear fetch per (sample, view) at
    every ``stride``-th depth sample; bilinear = 4 map rows)."""
    fetched = n_rays * ((dn + stride - 1) // stride) * v
    rows = fetched * 4                      # bilinear taps
    bytes_ = rows * row_ch * dtype_bytes
    lat_lo, lat_hi = (rows * ns * 1e-9 for ns in GATHER_NS_PER_ROW)
    return {"rows": rows, "hbm_bytes": bytes_,
            "latency_floor_s": (lat_lo, lat_hi)}


def frame_model(h: int, w: int, dn_coarse: int = 64, dn_fine: int = 64,
                stride: int = 4, stride_fine: int = 16, v: int = 2,
                coarse_geometry_only: bool = True,
                lowres_coarse: int = 1,
                dtype: str = "bfloat16") -> dict:
    """Whole-frame analytic cost at the serving operating point.

    :param lowres_coarse: low-res coarse importance factor f — the coarse
        pass runs on (h/f, w/f) rays (``full_render`` coarse_lowres), so
        its agg flops and gather rows divide by f².
    :return: dict with per-stage flops/bytes and the frame totals; feed
        measured seconds to :func:`achieved` for MFU / ceiling fractions.
    """
    rays = h * w
    crays = rays // (lowres_coarse * lowres_coarse)
    dtb = 2 if dtype == "bfloat16" else 4
    agg = (agg_stage(crays, dn_coarse, v, geometry_only=coarse_geometry_only,
                     dtype_bytes=dtb)
           + agg_stage(rays, dn_fine, v, geometry_only=False,
                       dtype_bytes=dtb))
    g_c = gather_stage(crays, dn_coarse, stride, v, dtype_bytes=dtb)
    g_f = gather_stage(rays, dn_fine, stride_fine, v, dtype_bytes=dtb)
    gather = {
        "rows": g_c["rows"] + g_f["rows"],
        "hbm_bytes": g_c["hbm_bytes"] + g_f["hbm_bytes"],
        "latency_floor_s": tuple(a + b for a, b in
                                 zip(g_c["latency_floor_s"],
                                     g_f["latency_floor_s"])),
    }
    return {"agg_flops": agg.flops, "agg_hbm_bytes": agg.hbm_bytes,
            "gather_rows": gather["rows"],
            "gather_hbm_bytes": gather["hbm_bytes"],
            "gather_latency_floor_s": gather["latency_floor_s"],
            "dtype": dtype}


def achieved(model: dict, agg_sec: float, gather_sec: float) -> dict:
    """Achieved-vs-peak for the two dominant stages.

    :param model: output of :func:`frame_model`.
    :param agg_sec / gather_sec: measured per-frame seconds in each stage.
    """
    peak = PEAK_FLOPS[model["dtype"]]
    lo, hi = model["gather_latency_floor_s"]
    return {
        "agg_mfu": model["agg_flops"] / (agg_sec * peak),
        "agg_hbm_frac": model["agg_hbm_bytes"] / (agg_sec * PEAK_HBM_BYTES),
        "gather_hbm_frac": model["gather_hbm_bytes"]
        / (gather_sec * PEAK_HBM_BYTES),
        # >1 means faster than the scattered-row latency model (rows are
        # being coalesced); <lo/gather_sec..hi/gather_sec brackets it
        "gather_latency_model_frac": (lo / gather_sec, hi / gather_sec),
    }
