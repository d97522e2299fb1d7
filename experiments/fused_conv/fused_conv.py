"""Fused [add-emb] -> GroupNorm(fp32) -> SiLU -> 3x3 same-conv Pallas kernel.

The ResBlock hot path (reference openaimodel3d.py:151-155, 175-180;
models/blocks.py here) is GN -> SiLU -> conv3x3, optionally preceded by the
timestep-embedding add. XLA executes this as a stats reduction + a
normalize/activate pass + a conv — three HBM round trips of the activation.
This kernel does all of it in one VMEM residency per sample.

Design (one grid cell per batch*frame sample):
  * the input arrives zero-padded and FLATTENED to ((H+2)*(W+2), C) so the
    3x3 conv decomposes into 9 row-shifted 2D matmuls
    acc[r] += act[r + di*(W+2)+dj] @ K[di,dj]  — shifts never wrap into
    wrong pixels because the shifted window only picks up zeroed padding;
  * GN statistics in fp32 via masked channel sums; group reduction and
    group->channel broadcast are both tiny 2D matmuls against a selector
    matrix (gather/scatter-free);
  * output = acc.reshape(H, W+2, Co)[:, :W] written once.

Falls back to the XLA path off-TPU or when shapes exceed the VMEM budget.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conservative per-program VMEM budget (bytes)
_VMEM_BUDGET = 96 * 1024 * 1024


def _kernel(x_ref, w_ref, b_ref, gscale_ref, gbias_ref, emb_ref, sel_ref,
            o_ref, *, groups: int, eps: float, h: int, w: int, has_emb: bool):
    c = x_ref.shape[-1]
    cg = c // groups
    wp = w + 2
    flat_len = (h + 2) * wp + 2  # +2: headroom for the max window shift
    full = x_ref[0].astype(jnp.float32)          # (flat_len, C)
    if has_emb:
        i = pl.program_id(0)
        full = full + emb_ref[i, :][None, :].astype(jnp.float32)

    # interior mask (padding ring must not enter stats and must stay zero)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (flat_len, 1), 0)
    col = ridx % wp
    interior = ((ridx >= wp) & (ridx < (h + 1) * wp)
                & (col >= 1) & (col <= w))       # (flat_len, 1)
    masked = jnp.where(interior, full, 0.0)

    # GroupNorm stats: channel sums -> group sums via selector matmul
    s1 = jnp.sum(masked, axis=0, keepdims=True)              # (1, C)
    s2 = jnp.sum(masked * masked, axis=0, keepdims=True)     # (1, C)
    sel = sel_ref[...]                                       # (G, C) 0/1
    n_el = jnp.float32(h * w * cg)
    dimnums = (((1,), (1,)), ((), ()))
    g1 = jax.lax.dot_general(s1, sel, dimnums,
                             preferred_element_type=jnp.float32) / n_el  # (1,G)
    g2 = jax.lax.dot_general(s2, sel, dimnums,
                             preferred_element_type=jnp.float32) / n_el
    var = g2 - g1 * g1
    inv = jax.lax.rsqrt(var + eps)                           # (1, G)
    # group -> channel broadcast, again via the selector
    mean_c = jnp.dot(g1, sel, preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jnp.dot(inv, sel, preferred_element_type=jnp.float32)

    scale = gscale_ref[:][None, :] * inv_c
    bias = gbias_ref[:][None, :] - mean_c * scale
    act = full * scale + bias
    act = act * jax.lax.logistic(act)                        # SiLU
    act = jnp.where(interior, act, 0.0).astype(x_ref.dtype)

    out_len = h * wp
    acc = jnp.zeros((out_len, w_ref.shape[-1]), jnp.float32)
    for di in range(3):
        for dj in range(3):
            shift = di * wp + dj
            win = act[shift:shift + out_len, :]
            acc = acc + jax.lax.dot_general(
                win, w_ref[di, dj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = acc + b_ref[:][None, :]
    out = acc.reshape(h, wp, -1)[:, :w, :]
    o_ref[0] = out.astype(o_ref.dtype)


def _vmem_bytes(h, w, c, co, dtype_bytes=2):
    flat = (h + 2) * (w + 2) + 2
    return (flat * c * dtype_bytes          # input tile
            + flat * c * 4                  # fp32 activation value
            + h * (w + 2) * co * 4          # fp32 accumulator
            + 9 * c * co * dtype_bytes      # weights
            + h * w * co * dtype_bytes)     # output tile


def supported(x_shape, c_out: int) -> bool:
    n, h, w, c = x_shape
    return (c % 32 == 0
            and _vmem_bytes(h, w, c, c_out) < _VMEM_BUDGET)


def fused_gn_silu_conv(
    x: jax.Array,                 # (N, H, W, C)
    kernel: jax.Array,            # (3, 3, C, Co)
    bias: jax.Array,              # (Co,)
    gn_scale: jax.Array,          # (C,)
    gn_bias: jax.Array,           # (C,)
    emb: Optional[jax.Array] = None,   # (N, C) pre-GN residual add
    *,
    groups: int = 32,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """conv3x3(silu(groupnorm(x [+ emb]))), one fused pass per sample."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    co = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n, (h + 2) * (w + 2), c)
    xp = jnp.pad(xp, ((0, 0), (0, 2), (0, 0)))  # headroom for max shift
    has_emb = emb is not None
    if emb is None:
        emb = jnp.zeros((n, c), x.dtype)
    sel = jnp.asarray(np.repeat(np.eye(groups, dtype=np.float32),
                                c // groups, axis=1))

    kern = functools.partial(_kernel, groups=groups, eps=eps, h=h, w=w,
                             has_emb=has_emb)
    flops = 2 * n * h * w * c * co * 9
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, (h + 2) * (w + 2) + 2, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, 3, c, co), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((co,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((groups, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=n * h * w * c,
        ),
        interpret=interpret,
    )(xp, kernel, bias, gn_scale.astype(jnp.float32),
      gn_bias.astype(jnp.float32), emb, sel)
