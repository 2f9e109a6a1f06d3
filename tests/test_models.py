"""Model-library tests: the conv ODE field (the reference's flagship
ODE-Net workload) against a torch oracle of the reference's ODEfunc
(reference examples/odenet_mnist.py:76-113), with copied weights.

The oracle is re-stated here in torch (not imported from the reference's
example script, which parses argv at module scope).  Layout notes:
* torch conv weight (out, in, kh, kw) -> our HWIO (kh, kw, in, out).
* The reference's ConcatConv2d prepends the time channel
  (`cat([tt, x], 1)`); ours appends it — an input-channel permutation of
  conv1/conv2, handled by rolling the input-channel axis of the weights.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchdiffeq_tpu.models.conv_ode import (init_conv_field, conv_field,
                                             conv_field_flops, group_norm,
                                             init_conv, conv_apply,
                                             conv_apply_packed,
                                             conv_field_packed, concat_time,
                                             conv_apply_foldt,
                                             conv_field_foldt)

torch = pytest.importorskip("torch")


def _torch_odefunc(params, t, x_nchw, dim):
    """Reference ODEfunc.forward (odenet_mnist.py:105-113) in torch f64."""
    import torch.nn.functional as F

    def gn(x):
        return F.group_norm(x, min(32, dim))

    def concat_conv(p, t, x):
        # reference ConcatConv2d: time channel FIRST (odenet_mnist.py:86-89)
        tt = torch.ones_like(x[:, :1]) * t
        inp = torch.cat([tt, x], 1)
        # our weights are HWIO with t LAST: bring t to the front of the
        # input-channel axis, then convert HWIO -> OIHW
        w = torch.from_numpy(np.asarray(p['w'], np.float64))
        w = torch.roll(w, shifts=1, dims=2)         # (..., [t, x...], out)
        w = w.permute(3, 2, 0, 1)                   # OIHW
        b = torch.from_numpy(np.asarray(p['b'], np.float64))
        return F.conv2d(inp, w, b, padding=1)

    h = gn(x_nchw)
    h = F.relu(h)
    h = concat_conv(params['conv1'], t, h)
    h = gn(h)
    h = F.relu(h)
    h = concat_conv(params['conv2'], t, h)
    return gn(h)


@pytest.mark.parametrize("dim,hw", [(64, 6), (8, 5)])
def test_conv_field_matches_reference_odefunc(dim, hw):
    key = jax.random.PRNGKey(0)
    params = init_conv_field(key, dim, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, hw, hw, dim),
                          jnp.float64)
    t = 0.37
    ours = np.asarray(conv_field(params, t, x))            # NHWC

    x_t = torch.from_numpy(np.asarray(x, np.float64)).permute(0, 3, 1, 2)
    ref = _torch_odefunc(params, t, x_t, dim)
    ref = ref.permute(0, 2, 3, 1).numpy()                  # -> NHWC
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_conv_field_solve_matches_reference_odeint():
    """Full flagship-workload slice: dopri5 through the conv field matches
    the reference solver + reference ODEfunc end-to-end (weights copied)."""
    sys_path_added = False
    import sys
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
        sys_path_added = True
    try:
        from torchdiffeq import odeint as ref_odeint
    finally:
        if sys_path_added:
            sys.path.remove('/root/reference')
    import torchdiffeq_tpu as tde

    dim, hw = 8, 5
    params = init_conv_field(jax.random.PRNGKey(0), dim, dtype=jnp.float64)
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, dim),
                                 jnp.float64)
    t = jnp.array([0.0, 1.0], jnp.float64)
    fn = lambda tt, yy, p: conv_field(p, tt, yy)

    ys, stats = tde.odeint_with_stats(fn, x0, t, rtol=1e-7, atol=1e-9,
                                      args=(params,))

    x0_t = torch.from_numpy(np.asarray(x0, np.float64).copy())
    x0_t = x0_t.permute(0, 3, 1, 2)
    t_t = torch.tensor([0.0, 1.0], dtype=torch.float64)
    ref_nfe = [0]

    def tfield(tt, yy):
        ref_nfe[0] += 1
        return _torch_odefunc(params, tt, yy, dim)

    ref_ys = ref_odeint(tfield, x0_t, t_t, rtol=1e-7, atol=1e-9)
    ref_final = ref_ys[1].permute(0, 2, 3, 1).numpy()

    # The GN field amplifies local error, so at rtol=1e-7 either solver
    # lands ~3e-5 from truth (ULP-level f64 GN differences shift the
    # controller; NFE drifts a couple %).  Judge each against a tight
    # ground truth and bound the cross-solver drift + NFE ratio.
    gt = np.asarray(tde.odeint(fn, x0, t, rtol=1e-12, atol=1e-13,
                               args=(params,))[1])
    assert np.max(np.abs(np.asarray(ys[1]) - gt)) < 2e-4
    assert np.max(np.abs(ref_final - gt)) < 2e-4
    assert np.max(np.abs(np.asarray(ys[1]) - ref_final)) < 2e-4
    assert abs(int(stats.nfe) / ref_nfe[0] - 1.0) < 0.05


def test_group_norm_f32_stats_for_bf16():
    x = (1.0 + jax.random.normal(jax.random.PRNGKey(0),
                                 (2, 4, 4, 16))).astype(jnp.bfloat16)
    out = group_norm(x)
    assert out.dtype == jnp.bfloat16
    # normalised: per-group mean ~0, var ~1 (checked in f32)
    o32 = out.astype(jnp.float32)
    assert abs(float(o32.mean())) < 0.05
    assert abs(float(o32.var()) - 1.0) < 0.1


def test_conv_field_flops_counts_both_convs():
    # 2 convs, each 2*B*H*W*9*(dim+1)*dim
    assert conv_field_flops(4, 6, 6, 64) == 2 * (2 * 4 * 6 * 6 * 9 * 65 * 64)


@pytest.mark.parametrize("hw,dim", [((6, 6), 16), ((4, 8), 8), ((3, 4), 8)])
def test_conv_apply_packed_matches_baseline(hw, dim):
    """Width-packing is a bit-level reshuffle of the same multiply-adds:
    values and parameter gradients must match the plain 3x3 SAME conv."""
    h, w = hw
    p = init_conv(jax.random.PRNGKey(0), dim + 1, dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, dim + 1),
                          jnp.float32)
    yb = conv_apply(p, x)
    yp = conv_apply_packed(p, x)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yb),
                               rtol=2e-5, atol=2e-5)

    def loss(fn, w_):
        return jnp.sum(fn(dict(w=w_, b=p['b']), x) ** 2)

    gb = jax.grad(lambda w_: loss(conv_apply, w_))(p['w'])
    gp = jax.grad(lambda w_: loss(conv_apply_packed, w_))(p['w'])
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gb),
                               rtol=2e-4, atol=2e-4)


def test_conv_apply_packed_odd_width_falls_back():
    p = init_conv(jax.random.PRNGKey(0), 9, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 9), jnp.float32)
    np.testing.assert_allclose(np.asarray(conv_apply_packed(p, x)),
                               np.asarray(conv_apply(p, x)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("hw,dim", [((6, 6), 16), ((5, 7), 8)])
def test_conv_apply_foldt_matches_concat_conv(hw, dim):
    """Folding the spatially-constant time channel out of the conv is the
    same multiply-adds re-associated: values and gradients (params, state,
    t) must match `conv_apply(p, concat_time(t, x))` to rounding — border
    positions included (the tmap conv reproduces SAME-padding tap loss)."""
    h, w = hw
    p = init_conv(jax.random.PRNGKey(0), dim + 1, dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, dim), jnp.float32)
    t_pt = jnp.float32(0.37)
    yb = conv_apply(p, concat_time(t_pt, x))
    yf = conv_apply_foldt(p, t_pt, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yb),
                               rtol=2e-5, atol=2e-5)

    def loss(fn, w_, tt, xx):
        return jnp.sum(fn(dict(w=w_, b=p['b']), tt, xx) ** 2)

    base = lambda pp, tt, xx: conv_apply(pp, concat_time(tt, xx))
    gb = jax.grad(lambda w_, tt, xx: jnp.sum(
        base(dict(w=w_, b=p['b']), tt, xx) ** 2),
        argnums=(0, 1, 2))(p['w'], t_pt, x)
    gf = jax.grad(loss, argnums=(1, 2, 3))(conv_apply_foldt, p['w'], t_pt, x)
    for a, b in zip(gf, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_conv_field_foldt_matches_conv_field():
    """The folded field integrates to the same solution with comparable
    NFE (values match to rounding, so the controller's steps agree)."""
    import torchdiffeq_tpu as tde

    dim, hw = 16, 6
    params = init_conv_field(jax.random.PRNGKey(0), dim)
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, dim),
                                 jnp.float32)
    t_pt = jnp.float32(0.37)
    np.testing.assert_allclose(
        np.asarray(conv_field_foldt(params, t_pt, x0)),
        np.asarray(conv_field(params, t_pt, x0)), rtol=3e-5, atol=3e-5)

    t = jnp.array([0.0, 1.0], jnp.float32)
    yb, sb = tde.odeint_with_stats(lambda tt, yy, p: conv_field(p, tt, yy),
                                   x0, t, rtol=1e-5, atol=1e-6,
                                   args=(params,))
    yf, sf = tde.odeint_with_stats(
        lambda tt, yy, p: conv_field_foldt(p, tt, yy),
        x0, t, rtol=1e-5, atol=1e-6, args=(params,))
    np.testing.assert_allclose(np.asarray(yf[1]), np.asarray(yb[1]),
                               rtol=1e-4, atol=1e-4)
    assert abs(int(sf.nfe) - int(sb.nfe)) <= 6


def test_conv_field_packed_matches_conv_field():
    """The packed field integrates to the same solution with the same NFE:
    the solver sees bit-comparable field values, so the controller's step
    sequence is preserved (same-trajectory guarantee for the fast path)."""
    import torchdiffeq_tpu as tde

    dim, hw = 16, 6
    params = init_conv_field(jax.random.PRNGKey(0), dim)
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, dim),
                                 jnp.float32)
    t_pt = jnp.float32(0.37)
    fb = conv_field(params, t_pt, x0)
    fp = conv_field_packed(params, t_pt, x0)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fb),
                               rtol=3e-5, atol=3e-5)

    t = jnp.array([0.0, 1.0], jnp.float32)
    yb, sb = tde.odeint_with_stats(lambda tt, yy, p: conv_field(p, tt, yy),
                                   x0, t, rtol=1e-5, atol=1e-6,
                                   args=(params,))
    yp, sp = tde.odeint_with_stats(
        lambda tt, yy, p: conv_field_packed(p, tt, yy),
        x0, t, rtol=1e-5, atol=1e-6, args=(params,))
    np.testing.assert_allclose(np.asarray(yp[1]), np.asarray(yb[1]),
                               rtol=1e-4, atol=1e-4)
    assert abs(int(sp.nfe) - int(sb.nfe)) <= 6
