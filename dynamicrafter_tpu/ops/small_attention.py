"""Pallas TPU kernel for tiny-sequence (temporal) self-attention.

DynamiCrafter's temporal attention runs T=16-token self-attention at every
spatial position (reference lvdm/modules/attention.py:365-412). As batched
XLA einsums the (T, T) logit tiles put 16 elements on the 128-lane axis —
8x lane waste, thousands of tiny matmuls. This kernel packs P = 128//T
positions into one (P*T, P*T) MXU tile and masks the block-diagonal, so the
softmax runs on full 128-lane rows and the matmuls are 128-wide. The extra
(P-1)/P of the tile is wasted FLOPs, but temporal attention is bandwidth-
bound (~0.8 GFLOP total at 320x512), so full-tile MXU work is free.

Forward-only Pallas; backward goes through the XLA reference (the logits
matrix is (T, T) — tiny) via custom_vjp.

The kernel reads the natural (G, T, H*D) layout directly (heads as 64-lane
value slices — compiles on this toolchain, saves the (G,T,H,D)->(H,G,T,D)
transpose copies a head-major grid would need: measured ~0.7 ms per call
at the 320x512 ds1 shape even with CSE'd q=k=v).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, t: int, p: int, rb: int,
               heads: int, d: int, scale: float):
    """Blocks are (ppb, t, H*D) slices of the natural (G, T, H*D)
    layout; heads are d-lane VALUE slices in-kernel (compiles on this
    toolchain; ref-slicing at 64-lane offsets does not). Each row group
    packs p positions into one (pt, pt) block-diagonal logits tile."""
    pt = p * t
    row = jax.lax.broadcasted_iota(jnp.int32, (pt, pt), 0) // t
    col = jax.lax.broadcasted_iota(jnp.int32, (pt, pt), 1) // t
    diag = row == col
    for r in range(rb):
        sl = slice(r * p, (r + 1) * p)
        q = q_ref[sl].reshape(pt, heads * d)
        k = k_ref[sl].reshape(pt, heads * d)
        v = v_ref[sl].reshape(pt, heads * d)
        outs = []
        for hh in range(heads):
            lanes = slice(hh * d, (hh + 1) * d)
            s = jax.lax.dot_general(
                q[:, lanes], k[:, lanes], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(diag, s, _NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            att = e / jnp.sum(e, axis=1, keepdims=True)
            outs.append(jax.lax.dot(att.astype(v.dtype), v[:, lanes],
                                    preferred_element_type=jnp.float32))
        o = jnp.concatenate(outs, axis=-1)
        o_ref[sl] = o.reshape(p, t, heads * d).astype(o_ref.dtype)


def _small_t_fwd(q, k, v, scale, interpret, rb: int = 16):
    """q, k, v: (G, T, H, D). No data movement outside the kernel beyond a
    free (G, T, H*D) reshape and G padding."""
    g, t, h, d = q.shape
    p = max(1, 128 // t)
    while p * rb > max(g, p):
        rb //= 2
    # blocks now span all heads; keep q/k/v/out blocks + double buffering
    # under the ~19 MB scoped-VMEM limit (observed OOM at hd=512, rb=16)
    while rb > 1 and p * rb * t * h * d * q.dtype.itemsize * 8 > 12 * 2 ** 20:
        rb //= 2
    ppb = p * rb
    pad_g = (-g) % ppb
    re = lambda x: x.reshape(g, t, h * d)
    q, k, v = re(q), re(k), re(v)
    if pad_g:
        padg = ((0, pad_g), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, padg), jnp.pad(k, padg), jnp.pad(v, padg)
    gp = g + pad_g

    spec = pl.BlockSpec((ppb, t, h * d), lambda gi: (gi, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, t=t, p=p, rb=rb, heads=h, d=d,
                          scale=scale),
        grid=(gp // ppb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((gp, t, h * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * gp * h * p * t * t * d,
            bytes_accessed=4 * gp * t * h * d * q.dtype.itemsize,
            transcendentals=gp * h * t * t * p,
        ),
        interpret=interpret,
    )(q, k, v)
    if pad_g:
        out = out[:g]
    return out.reshape(g, t, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _small_t_attention(q, k, v, scale, interpret):
    return _small_t_fwd(q, k, v, scale, interpret)


def _xla_ref(q, k, v, scale):
    # logits keep the large G axis on the 128-lane minor dim: a (T, T)-minor
    # layout pads 8x on f32 TPU tiles (measured 360 MB vs 45 MB per layer in
    # the 1024 training backward, which routes through this ref's vjp)
    s = jnp.einsum("gqhd,gkhd->hqkg", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    att = jax.nn.softmax(s, axis=2)
    return jnp.einsum("hqkg,gkhd->gqhd", att.astype(v.dtype), v).astype(q.dtype)


def _vjp_fwd(q, k, v, scale, interpret):
    return _small_t_fwd(q, k, v, scale, interpret), (q, k, v)


def _vjp_bwd(scale, interpret, res, grad):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_ref(a, b, c, scale), q, k, v)
    return vjp(grad)


_small_t_attention.defvjp(_vjp_fwd, _vjp_bwd)


def _kernel_tmajor(q_ref, k_ref, v_ref, o_ref, *, t: int, p: int, rb: int,
                   heads: int, d: int, scale: float):
    """Time-major variant: blocks are (1, t, ppb, H*D) slices of the natural
    (B, T, G, H*D) layout — the layout the surrounding UNet already uses —
    so NO HBM transpose is needed on either side of the call. Rows of the
    packed (pt, pt) logits tile are ordered row = tt*p + pp (a free reshape
    of the (t, p, hd) VMEM slice), which turns the block-diagonal mask of
    the position-major kernel into a stripe mask (row % p == col % p)."""
    pt = p * t
    row = jax.lax.broadcasted_iota(jnp.int32, (pt, pt), 0) % p
    col = jax.lax.broadcasted_iota(jnp.int32, (pt, pt), 1) % p
    stripe = row == col
    for r in range(rb):
        sl = slice(r * p, (r + 1) * p)
        q = q_ref[0, :, sl].reshape(pt, heads * d)
        k = k_ref[0, :, sl].reshape(pt, heads * d)
        v = v_ref[0, :, sl].reshape(pt, heads * d)
        outs = []
        for hh in range(heads):
            lanes = slice(hh * d, (hh + 1) * d)
            s = jax.lax.dot_general(
                q[:, lanes], k[:, lanes], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(stripe, s, _NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            att = e / jnp.sum(e, axis=1, keepdims=True)
            outs.append(jax.lax.dot(att.astype(v.dtype), v[:, lanes],
                                    preferred_element_type=jnp.float32))
        o = jnp.concatenate(outs, axis=-1)
        o_ref[0, :, sl] = o.reshape(t, p, heads * d).astype(o_ref.dtype)


def _small_t_fwd_tmajor(q, k, v, scale, interpret, rb: int = 2):
    """q, k, v: (B, T, G, H, D) — attention over T for each (B, G) column,
    consumed directly in the spatial-major layout (no transposes).

    rb=2 default from the round-5 on-chip sweep (rb in {1,2,4,16} at every
    hot 512/1024 shape): smaller blocks pipeline the per-(r, head) dot+
    softmax chains better — e.g. 1024-ds1 (g=9216, 5h) 5.62 ms at rb=2 vs
    6.39 at the old rb=16; best-or-within-noise at all other shapes.
    Hoisting the strided (t,p,hd)->(pt,hd) merges into one per-block
    transpose and an additive-bias mask were both measured NEUTRAL (the
    merge shuffles were not the cost); position-major kernel + HBM
    transposes measured strictly worse (8.2 vs 5.6 ms)."""
    b, t, g, h, d = q.shape
    p = max(1, 128 // t)
    while p * rb > max(g, p):
        rb //= 2
    while rb > 1 and p * rb * t * h * d * q.dtype.itemsize * 8 > 12 * 2 ** 20:
        rb //= 2
    ppb = p * rb
    pad_g = (-g) % ppb
    re = lambda x: x.reshape(b, t, g, h * d)
    q, k, v = re(q), re(k), re(v)
    if pad_g:
        padg = ((0, 0), (0, 0), (0, pad_g), (0, 0))
        q, k, v = jnp.pad(q, padg), jnp.pad(k, padg), jnp.pad(v, padg)
    gp = g + pad_g

    spec = pl.BlockSpec((1, t, ppb, h * d), lambda bi, gi: (bi, 0, gi, 0))
    out = pl.pallas_call(
        functools.partial(_kernel_tmajor, t=t, p=p, rb=rb, heads=h, d=d,
                          scale=scale),
        grid=(b, gp // ppb),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, gp, h * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * gp * h * p * t * t * d,
            bytes_accessed=4 * b * gp * t * h * d * q.dtype.itemsize,
            transcendentals=b * gp * h * t * t * p,
        ),
        interpret=interpret,
    )(q, k, v)
    if pad_g:
        out = out[:, :, :g]
    return out.reshape(b, t, g, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _small_t_attention_tmajor(q, k, v, scale, interpret):
    return _small_t_fwd_tmajor(q, k, v, scale, interpret)


def _xla_ref_tmajor(q, k, v, scale):
    # G on the minor (lane) axis — see _xla_ref
    s = jnp.einsum("bqghd,bkghd->bhqkg", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    att = jax.nn.softmax(s, axis=3)
    return jnp.einsum("bhqkg,bkghd->bqghd", att.astype(v.dtype),
                      v).astype(q.dtype)


def _vjp_fwd_tmajor(q, k, v, scale, interpret):
    return _small_t_fwd_tmajor(q, k, v, scale, interpret), (q, k, v)


def _vjp_bwd_tmajor(scale, interpret, res, grad):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_ref_tmajor(a, b, c, scale), q, k, v)
    return vjp(grad)


_small_t_attention_tmajor.defvjp(_vjp_fwd_tmajor, _vjp_bwd_tmajor)


def small_t_attention_tmajor(q, k, v, scale=None, interpret=None):
    """Self-attention over a small T axis at axis 1 of (B, T, G, H, D) —
    i.e. the (B, T, HW, C)-derived layout — with no layout change. Requires
    128 % T == 0. Returns (B, T, G, H, D)."""
    t = q.shape[1]
    assert q.shape == k.shape == v.shape, "small-T path is self-attention only"
    assert 128 % t == 0, f"T={t} must divide 128"
    assert q.ndim == 5
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _small_t_attention_tmajor(q, k, v, scale, interpret)


def small_t_attention(q, k, v, scale=None, interpret=None):
    """Self-attention over a small T axis. q/k/v: (..., T, H, D), identical
    shapes; returns (..., T, H, D). Requires 128 % T == 0."""
    t = q.shape[-3]
    assert q.shape == k.shape == v.shape, "small-T path is self-attention only"
    assert 128 % t == 0, f"T={t} must divide 128"
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch = q.shape[:-3]
    g = 1
    for s in batch:
        g *= s
    qr = q.reshape((g,) + q.shape[-3:])
    kr = k.reshape((g,) + k.shape[-3:])
    vr = v.reshape((g,) + v.shape[-3:])
    out = _small_t_attention(qr, kr, vr, scale, interpret)
    return out.reshape(q.shape)
