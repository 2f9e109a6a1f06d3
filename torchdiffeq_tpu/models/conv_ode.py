"""Convolutional ODE fields: the reference's flagship ODE-Net workload.

JAX re-design of the reference's image-classifier vector field
(examples/odenet_mnist.py:76-113): `ConcatConv2d` concatenates the scalar
time as an extra input channel before a 3x3 SAME conv, and `ODEfunc` runs

    norm1 -> relu -> concat(t)+conv1 -> norm2 -> relu -> concat(t)+conv2
          -> norm3

with GroupNorm(min(32, dim)) for every norm (reference :18-19).  The MNIST
pipeline downsamples 28x28 inputs to a (B, 64, 6, 6) state before the ODE
block, so the canonical benchmark state here is NHWC (B, 6, 6, 64).

TPU notes:
* Layout is NHWC; XLA lowers 3x3 SAME convs to implicit GEMMs on the MXU
  with K = 9*(dim+1) and N = dim.  `dim=64` (the reference's size) fills
  only half of the MXU's 128 output lanes — a ~2x utilisation ceiling that
  is a property of the MODEL, not the solver (see benchmarks/PERF.md's
  conv-field section).  `dim=128` variants hit full lanes.
* Parameters are explicit pytrees; everything here is a pure function, so
  the field composes with jit/grad/vmap/shard_map and the library's
  adjoint.
* GroupNorm statistics are computed in f32 even for bf16 states (variance
  of a bf16 tensor loses ~half the mantissa to cancellation); the
  normalised output is cast back to the input dtype.
* Two opt-in same-math variants exist for the dim<=64 lane/bandwidth
  regime, both measured (benchmarks/PERF.md conv section;
  dev/conv_foldt_probe.py): `conv_field_packed` (width-packing, two output
  columns per MXU pass) and `conv_field_foldt` (folds the spatially-
  constant time channel out of the conv, removing the (B,H,W,C+1) concat
  materialisation — ~4-10% faster forward solves, neutral-to-slightly-
  negative on the adjoint training step, so neither is the default).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_conv(key, c_in, c_out, k=3, dtype=jnp.float32):
    """He-initialised k x k conv (HWIO) + bias, as an explicit pytree."""
    w = jax.random.normal(key, (k, k, c_in, c_out), dtype) \
        * math.sqrt(2.0 / (k * k * c_in))
    return dict(w=w, b=jnp.zeros((c_out,), dtype))


def conv_apply(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p['w'].astype(x.dtype), (stride, stride), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + p['b'].astype(y.dtype)


def group_norm(x, groups=32, eps=1e-5):
    """GroupNorm over NHWC with `min(groups, C)` groups (reference
    odenet_mnist.py:18-19 `nn.GroupNorm(min(32, dim), dim)`), reduced down
    to the largest divisor of C.  Stats in f32, output in x.dtype."""
    n, h, w, c = x.shape
    g = max(d for d in range(1, min(groups, c) + 1) if c % d == 0)
    stat_dtype = jnp.promote_types(x.dtype, jnp.float32)  # bf16 -> f32, f64 stays f64
    xg = x.astype(stat_dtype).reshape(n, h, w, g, c // g)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    out = (xg - mean) * jax.lax.rsqrt(var + eps)
    return out.reshape(n, h, w, c).astype(x.dtype)


def concat_time(t, x):
    """ConcatConv2d's input transform (reference odenet_mnist.py:76-89):
    append a channel filled with `t`."""
    tt = jnp.broadcast_to(jnp.asarray(t).real.astype(x.dtype),
                          x.shape[:-1] + (1,))
    return jnp.concatenate([x, tt], axis=-1)


def init_conv_field(key, dim, dtype=jnp.float32):
    """Parameters for the reference ODEfunc: two time-concat 3x3 convs
    (dim+1 -> dim); the three GroupNorms are parameter-free here (the
    reference's affine GN weights initialise to identity)."""
    k1, k2 = jax.random.split(key)
    return dict(conv1=init_conv(k1, dim + 1, dim, dtype=dtype),
                conv2=init_conv(k2, dim + 1, dim, dtype=dtype))


def conv_field(params, t, x):
    """The reference ODEfunc forward (odenet_mnist.py:105-113):
    norm1 -> relu -> conv1(t,.) -> norm2 -> relu -> conv2(t,.) -> norm3."""
    h = group_norm(x)
    h = jax.nn.relu(h)
    h = conv_apply(params['conv1'], concat_time(t, h))
    h = group_norm(h)
    h = jax.nn.relu(h)
    h = conv_apply(params['conv2'], concat_time(t, h))
    return group_norm(h)


def _pack_kernel_w2(w):
    """(kh,3,Cin,C) -> (kh,4,Cin,2C): lanes 0..C-1 = the 3-wide conv at
    even output columns (kernel cols 0..2), lanes C..2C-1 = the same conv
    at odd columns (kernel cols 1..3)."""
    left = jnp.pad(w, ((0, 0), (0, 1), (0, 0), (0, 0)))
    right = jnp.pad(w, ((0, 0), (1, 0), (0, 0), (0, 0)))
    return jnp.concatenate([left, right], axis=-1)


def conv_apply_packed(p, x):
    """Width-packed 3x3 SAME conv: two adjacent output columns per MXU
    pass.  At C=64 output channels a 3x3 conv's implicit GEMM fills only
    64 of the MXU's 128 output lanes; packing the even/odd column pairs
    into one stride-(1,2) kernel-(3,4) conv with 2C output channels doubles
    lane occupancy for 4/3 the FLOPs (ideal 1.5x when lane-ceiling-bound —
    measured speedups in benchmarks/PERF.md's conv section).  Bit-exact
    reshuffle of the same multiply-adds; requires even spatial width.
    Gradients flow through the jnp.pad/concat kernel packing, so parameter
    cotangents match the unpacked conv."""
    n, h, w, _ = x.shape
    if w % 2:
        return conv_apply(p, x)
    c = p['w'].shape[-1]
    wp = _pack_kernel_w2(p['w'].astype(x.dtype))
    y = jax.lax.conv_general_dilated(
        x, wp, (1, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # (n, h, w/2, 2C): first C lanes are column 2j, next C are 2j+1 —
    # a (w/2, 2) -> w reshape restores column order.
    y = y.reshape(n, h, w // 2, 2, c).reshape(n, h, w, c)
    return y + p['b'].astype(y.dtype)


def conv_field_packed(params, t, x):
    """`conv_field` with width-packed convs (same parameters, same math —
    see `conv_apply_packed`).  Use when dim <= 64 and the spatial width is
    even; at dim=128 the plain conv already fills the MXU lanes."""
    h = group_norm(x)
    h = jax.nn.relu(h)
    h = conv_apply_packed(params['conv1'], concat_time(t, h))
    h = group_norm(h)
    h = jax.nn.relu(h)
    h = conv_apply_packed(params['conv2'], concat_time(t, h))
    return group_norm(h)


def conv_apply_foldt(p, t, x):
    """Time-concat 3x3 SAME conv WITHOUT the concat (reference
    ConcatConv2d, odenet_mnist.py:76-89, re-associated for bandwidth):
    the time channel is spatially constant, so its contribution through
    the conv is `t * tmap` where `tmap[i, j, co]` sums the time-channel
    kernel taps that land inside the image at output position (i, j) —
    computable once per eval as a conv of a ones-map with the (3,3,1,C)
    time slice of the kernel (a few hundred FLOPs).  This removes the
    (B, H, W, C+1) concat materialisation (one full write+read of the
    state per conv, twice per field eval) that `concat_time` + `conv_apply`
    pay.  Same multiply-adds re-associated (the t-taps accumulate outside
    the GEMM), so results match `conv_apply(p, concat_time(t, x))` to
    rounding; gradients wrt params, state, and t flow through both convs."""
    w = p['w'].astype(x.dtype)
    ts = jnp.asarray(t).real.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w[:, :, :-1, :], (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    tmap = jax.lax.conv_general_dilated(
        ones, w[:, :, -1:, :], (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + ts * tmap + p['b'].astype(y.dtype)


def conv_field_foldt(params, t, x):
    """`conv_field` with the time channel folded out of both convs (same
    parameters, same math — see `conv_apply_foldt`)."""
    h = group_norm(x)
    h = jax.nn.relu(h)
    h = conv_apply_foldt(params['conv1'], t, h)
    h = group_norm(h)
    h = jax.nn.relu(h)
    h = conv_apply_foldt(params['conv2'], t, h)
    return group_norm(h)


def conv_field_flops(batch, height, width, dim):
    """Matmul FLOPs of ONE conv_field evaluation (the two 3x3 convs; GN and
    relu are bandwidth, not MXU FLOPs): 2 * B*H*W * 9*(dim+1) * dim each."""
    return 2 * (2 * batch * height * width * 9 * (dim + 1) * dim)
