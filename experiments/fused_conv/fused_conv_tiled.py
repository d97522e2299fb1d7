"""Row-tiled, double-buffered fused normalize+SiLU+3x3-conv Pallas kernel.

Second-generation version of ops/fused_conv.py: GroupNorm statistics are
computed in a cheap XLA pre-pass (they need global spatial extent); the
Pallas kernel then streams row tiles with a manual double-buffered halo DMA
(the +-1-row overlap is inexpressible with BlockSpecs) and performs
normalize -> SiLU -> 3x3 conv per tile as 9 shifted 2D matmuls in VMEM.

Compared with the whole-image-per-program kernel, tiles pipeline across the
grid: DMA of tile i+1 overlaps compute of tile i.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(x):
    return ((x + 7) // 8) * 8


def _kernel(x_hbm, scale_ref, bias_ref, w_ref, b_ref, o_ref,
            buf0, buf1, sems, *, h, w, th, n_tiles):
    """Grid (N, h//th). x_hbm: (N, L, C) zero-padded flat rows in HBM."""
    wp = w + 2
    tile_rows = _round8((th + 2) * wp + 2)  # HBM slices need 8-row alignment
    out_len = th * wp
    n = pl.program_id(0)
    i = pl.program_id(1)
    c = x_hbm.shape[-1]

    bufs = (buf0, buf1)

    def dma(slot_static, tile_idx):
        start = tile_idx * th * wp
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(start, tile_rows), :],
            bufs[slot_static],
            sems.at[slot_static],
        )

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    # warm-up: first tile of this row-sweep
    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    # prefetch the next tile into the other buffer
    @pl.when((i + 1 < n_tiles) & (next_slot == 0))
    def _():
        dma(0, i + 1).start()

    @pl.when((i + 1 < n_tiles) & (next_slot == 1))
    def _():
        dma(1, i + 1).start()

    @pl.when(slot == 0)
    def _():
        dma(0, i).wait()

    @pl.when(slot == 1)
    def _():
        dma(1, i).wait()

    tile = jax.lax.cond(slot == 0, lambda: buf0[...], lambda: buf1[...])
    full = tile.astype(jnp.float32)
    scale = scale_ref[n, :][None, :]
    bias = bias_ref[n, :][None, :]
    act = full * scale + bias
    act = act * jax.lax.logistic(act)

    # zero the padding ring (global flat-row coordinates)
    base = i * th * wp
    ridx = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0) + base
    col = ridx % wp
    interior = ((ridx >= wp) & (ridx < (h + 1) * wp)
                & (col >= 1) & (col <= w))
    act = jnp.where(interior, act, 0.0).astype(x_hbm.dtype)

    acc = jnp.zeros((out_len, w_ref.shape[-1]), jnp.float32)
    for di in range(3):
        for dj in range(3):
            s0 = di * wp + dj
            acc = acc + jax.lax.dot_general(
                act[s0:s0 + out_len], w_ref[di, dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = acc + b_ref[:][None, :]
    o_ref[0] = acc.reshape(th, wp, -1)[:, :w, :].astype(o_ref.dtype)


def fused_gn_silu_conv_tiled(
    x: jax.Array,                 # (N, H, W, C)
    kernel: jax.Array,            # (3, 3, C, Co)
    bias: jax.Array,              # (Co,)
    gn_scale: jax.Array,          # (C,)
    gn_bias: jax.Array,           # (C,)
    emb: Optional[jax.Array] = None,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    tile_h: int = 8,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    co = kernel.shape[-1]
    assert h % tile_h == 0, f"tile_h {tile_h} must divide H {h}"
    n_tiles = h // tile_h
    wp = w + 2
    assert (tile_h * wp) % 8 == 0, "tile start rows must be 8-aligned"

    x32 = x.astype(jnp.float32)
    if emb is not None:
        x32 = x32 + emb[:, None, None, :].astype(jnp.float32)
    grp = x32.reshape(n, h * w, groups, c // groups)
    mean = grp.mean(axis=(1, 3))
    var = jnp.square(grp - mean[:, None, :, None]).mean(axis=(1, 3))
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    inv_c = jnp.repeat(inv, c // groups, axis=1)
    scale = gn_scale[None, :].astype(jnp.float32) * inv_c
    bias_nc = gn_bias[None, :].astype(jnp.float32) - mean_c * scale

    xe = x if emb is None else (x + emb[:, None, None, :]).astype(x.dtype)
    xp = jnp.pad(xe, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tile_rows = _round8((tile_h + 2) * wp + 2)
    flat_len = (n_tiles - 1) * tile_h * wp + tile_rows
    xp = xp.reshape(n, (h + 2) * wp, c)
    # HBM slices need 128-aligned lane extents: pad channels with zeros
    # (zero scale/bias rows keep the math exact)
    cp = ((c + 127) // 128) * 128
    xp = jnp.pad(xp, ((0, 0), (0, flat_len - xp.shape[1]), (0, cp - c)))
    scale = jnp.pad(scale, ((0, 0), (0, cp - c)))
    bias_nc = jnp.pad(bias_nc, ((0, 0), (0, cp - c)))
    kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cp - c), (0, 0)))
    kern = functools.partial(_kernel, h=h, w=w, th=tile_h, n_tiles=n_tiles)
    return pl.pallas_call(
        kern,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x stays in HBM
            pl.BlockSpec((n, cp), lambda ni, ti: (0, 0)),
            pl.BlockSpec((n, cp), lambda ni, ti: (0, 0)),
            pl.BlockSpec((3, 3, cp, co), lambda ni, ti: (0, 0, 0, 0)),
            pl.BlockSpec((co,), lambda ni, ti: (0,)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, co),
                               lambda ni, ti: (ni, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, cp), x.dtype),
            pltpu.VMEM((tile_rows, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * c * co * 9,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=n * h * w * c,
        ),
        interpret=interpret,
    )(xp, scale, bias_nc, kernel, bias)
