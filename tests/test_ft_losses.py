"""Finetune-stage loss tests."""

import numpy as np
import jax.numpy as jnp

from panogrf_tpu.train import ft_losses as F


def test_nll_gate():
    """Loss only applies where prediction disagrees with measurement."""
    pred = jnp.full((1, 8), 3.0)
    pv = jnp.full((1, 8), 0.01)
    tgt = jnp.full((1, 8), 3.0)
    tv = jnp.full((1, 8), 0.04)
    # agreeing: gate off -> ~0 normalized loss
    l0 = F.nll_depth_loss(pred, pv, tgt, tv, 0.5, 15.0)
    # disagreeing by > sigma
    l1 = F.nll_depth_loss(pred + 1.0, pv, tgt, tv, 0.5, 15.0)
    assert float(l1[0]) > float(l0[0])


def test_perpoint_prefers_peaked_weights():
    tvals = jnp.broadcast_to(jnp.linspace(1.0, 5.0, 16), (1, 4, 16))
    tgt = jnp.full((1, 4), 3.0)
    var = jnp.full((1, 4), 0.01)
    peak = jnp.exp(-0.5 * ((tvals - 3.0) / 0.1) ** 2)
    peak = peak / peak.sum(-1, keepdims=True)
    flat = jnp.full((1, 4, 16), 1 / 16.0)
    l_peak = F.perpoint_depth_loss(peak, tvals, tgt, var, 0.5)
    l_flat = F.perpoint_depth_loss(flat, tvals, tgt, var, 0.5)
    assert float(l_peak[0]) < float(l_flat[0])


def test_urf_components():
    tvals = jnp.broadcast_to(jnp.linspace(1.0, 5.0, 32), (1, 4, 32))
    tgt = jnp.full((1, 4), 3.0)
    var = jnp.full((1, 4), 0.05)
    good_w = jnp.exp(-0.5 * ((tvals - 3.0) / 0.2) ** 2)
    good_w = good_w / good_w.sum(-1, keepdims=True)
    bad_w = jnp.exp(-0.5 * ((tvals - 1.5) / 0.2) ** 2)
    bad_w = bad_w / bad_w.sum(-1, keepdims=True)
    good_depth = jnp.sum(good_w * tvals, -1)
    bad_depth = jnp.sum(bad_w * tvals, -1)
    dg, ng, eg = F.urf_depth_loss(good_depth, tvals, good_w, tgt, var, 0.5)
    db, nb, eb = F.urf_depth_loss(bad_depth, tvals, bad_w, tgt, var, 0.5)
    assert float(dg[0]) < float(db[0])
    assert float(eg[0]) < float(eb[0])  # bad weights sit in empty space


def test_depth_ft_dispatcher():
    pr = {"render_depth": jnp.full((1, 8), 3.0),
          "render_depth_fine": jnp.full((1, 8), 2.0),
          "render_uncert": jnp.full((1, 8), 0.01),
          "render_uncert_fine": jnp.full((1, 8), 0.01),
          "hit_prob_nr": jnp.full((1, 8, 4), 0.25),
          "hit_prob_nr_fine": jnp.full((1, 8, 4), 0.25),
          "que_depth": jnp.broadcast_to(jnp.linspace(1, 5, 4), (1, 8, 4)),
          "que_depth_fine": jnp.broadcast_to(jnp.linspace(1, 5, 4),
                                             (1, 8, 4))}
    gt = {"que_imgs_info": {
        "mvs_depth_at_coords": jnp.full((1, 8), 3.0),
        "mvs_var_at_coords": jnp.full((1, 8), 0.04)}}
    for lt in ["mse", "nll", "perpoint", "urf"]:
        out = F.depth_ft_loss(pr, gt, loss_type=lt)
        assert set(out) == {"loss_depth_ft", "loss_depth_ft_fine"}, lt
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()
    # mse: fine pass (depth 2 vs 3) must cost more than coarse (3 vs 3)
    out = F.depth_ft_loss(pr, gt, loss_type="mse")
    assert float(out["loss_depth_ft_fine"][0]) > float(
        out["loss_depth_ft"][0])


def test_uncert_head_and_loss():
    import jax
    from panogrf_tpu.models.uncert import DepthUncertHead, uncert_nll_loss
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 16, 32, 8)), jnp.float32)
    depth = jnp.full((1, 64, 128, 1), 3.0)
    head = DepthUncertHead(hidden=8)
    v = jax.jit(head.init)(jax.random.PRNGKey(0), feats, depth)
    sigma = jax.jit(head.apply)(v, feats, depth)
    assert sigma.shape == (1, 64, 128, 1)
    assert (np.asarray(sigma) > 0).all()
    gt = jnp.full((1, 64, 128, 1), 3.5)
    loss = uncert_nll_loss(depth, sigma, gt, 0.1, 10.0)
    assert np.isfinite(float(loss))
    # head gets gradients, base depth does not (stop_gradient)
    g = jax.grad(lambda vv: uncert_nll_loss(
        depth, head.apply(vv, feats, depth), gt, 0.1, 10.0))(v)
    assert float(jnp.abs(jax.tree.leaves(g)[0]).max()) >= 0
