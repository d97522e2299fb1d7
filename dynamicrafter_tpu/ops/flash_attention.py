"""Pallas TPU flash attention (forward + backward) with online softmax.

Replaces the reference's xformers memory_efficient_attention fast path
(lvdm/modules/attention.py:146-209) for the big spatial self-attention
(up to 72*128 = 9216 tokens at 1024-res). O(L) memory: the (Lq, Lk) scores
matrix is never materialized; running max/sum/acc live in VMEM scratch.

Backward: FlashAttention-2-style dq and dkv kernels. The vjp forward saves a
fused logsumexp residual lse = m + log(l) (lane-replicated (N, H, Lq, 128),
written only on the grad path — inference skips the extra HBM traffic); the
backward recomputes p = exp(s - lse) tile by tile, so the (Lq, Lk) matrix is
never materialized either way. This is what makes 576x1024 training possible:
the XLA fallback materializes 9216^2 logits and OOMs (the reference trains
1024 through xformers both directions, lvdm/modules/attention.py:175).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *rest,
                scale: float, kv_len: int, block_k: int, num_kv_blocks: int,
                save_lse: bool):
    if save_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0, 0]            # (bq, d)
    k = k_ref[0, 0]            # (bk, d)
    v = v_ref[0, 0]            # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                  # (bq, bk)

    # mask padded KV columns (when kv_len % block_k != 0)
    if kv_len % block_k != 0:
        col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
               + kv_idx * block_k)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[...]                                   # (bq, 128)
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)            # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)                  # (bq, 128)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, 0:1])                       # (bq, bk)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next
    acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_scr[...][:, 0:1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        if save_lse:
            # fused residual for the backward: lse = m + log(l). Note
            # zero-PADDED q rows still produce a finite, valid lse (s=0
            # against real K columns -> m=0, l=#real cols), so no special
            # case is needed for them; the l==0 guard below only protects
            # the log against a degenerate all-masked row, which cannot
            # occur with kv_len >= 1. Both backward kernels additionally
            # slice/mask padded q rows, so their lse is never consumed.
            lse = jnp.where(l_scr[...] == 0.0, 0.0,
                            m_scr[...] + jnp.log(jnp.maximum(l_scr[...],
                                                             1e-38)))
            lse_ref[0, 0] = lse


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret, save_lse=False):
    """q, k, v: (N, H, L, D) -> (N, H, Lq, D) [, lse (N, H, Lq_p, 128)]."""
    n, h, lq, d = q.shape
    lk = k.shape[2]

    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    lq_p, lk_p = lq + pad_q, lk + pad_k
    num_kv_blocks = lk_p // block_k

    grid = (n, h, lq_p // block_q, num_kv_blocks)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_len=lk, block_k=block_k,
        num_kv_blocks=num_kv_blocks, save_lse=save_lse,
    )
    out_shapes = [jax.ShapeDtypeStruct((n, h, lq_p, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d),
                              lambda n, h, qi, ki: (n, h, qi, 0))]
    if save_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((n, h, lq_p, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, block_q, 128),
                                      lambda n, h, qi, ki: (n, h, qi, 0)))
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda n, h, qi, ki: (n, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda n, h, qi, ki: (n, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda n, h, qi, ki: (n, h, ki, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * lq_p * lk_p * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=n * h * lq_p * lk_p,
        ),
        interpret=interpret,
    )(q, k, v)
    out = res[0]
    if pad_q:
        out = out[:, :, :lq]
    if save_lse:
        return out, res[1]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_nhld(q, k, v, scale, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, scale, block_q, block_k, interpret)


def _fwd_kernel_nlhd(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                     heads: int, d: int, scale: float, kv_len: int,
                     block_k: int, num_kv_blocks: int):
    """Transpose-free forward: blocks are (bq, H*D) slices of the natural
    (N, L, H*D) layout; heads are d-lane VALUE slices in-kernel. Saves the
    four (N, L, H, D) <-> (N, H, L, D) HBM transposes of the head-major
    grid (~5 ms/step at 320x512, more at 1024). Online softmax identical
    to _fwd_kernel; per-head running stats live in (H, bq, ...) scratch."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0]               # (bq, H*D)
    k = k_ref[0]               # (bk, H*D)
    v = v_ref[0]
    col = jax.lax.broadcasted_iota(
        jnp.int32, (q.shape[0], block_k), 1) + kv_idx * block_k
    pad_cols = kv_len % block_k != 0
    for hh in range(heads):
        lanes = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            q[:, lanes], k[:, lanes], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if pad_cols:
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_prev = m_scr[hh]
        l_prev = l_scr[hh]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, 0:1])
        l_scr[hh] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[hh] = m_next
        acc_scr[hh] = acc_scr[hh] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(v.dtype), v[:, lanes],
            preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        outs = []
        for hh in range(heads):
            l_final = l_scr[hh][:, 0:1]
            l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
            outs.append(acc_scr[hh] * l_inv)
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _flash_fwd_nlhd(q, k, v, heads, scale, block_q, block_k, interpret):
    """q, k, v: (N, L, H*D) -> (N, Lq, H*D)."""
    n, lq, hd = q.shape
    d = hd // heads
    lk = k.shape[1]
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    lq_p, lk_p = lq + pad_q, lk + pad_k
    num_kv_blocks = lk_p // block_k

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_nlhd, heads=heads, d=d, scale=scale, kv_len=lk,
            block_k=block_k, num_kv_blocks=num_kv_blocks),
        grid=(n, lq_p // block_q, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda n, qi, ki: (n, qi, 0)),
            pl.BlockSpec((1, block_k, hd), lambda n, qi, ki: (n, ki, 0)),
            pl.BlockSpec((1, block_k, hd), lambda n, qi, ki: (n, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd),
                               lambda n, qi, ki: (n, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n, lq_p, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((heads, block_q, 128), jnp.float32),
            pltpu.VMEM((heads, block_q, 128), jnp.float32),
            pltpu.VMEM((heads, block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * heads * lq_p * lk_p * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=n * heads * lq_p * lk_p,
        ),
        interpret=interpret,
    )(q, k, v)
    if pad_q:
        out = out[:, :lq]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention_nlhd(q, k, v, heads, scale, block_q, block_k,
                          interpret):
    return _flash_fwd_nlhd(q, k, v, heads, scale, block_q, block_k,
                           interpret)


def _nlhd_vjp_fwd(q, k, v, heads, scale, block_q, block_k, interpret):
    # grad path: reuse the proven head-major lse machinery (the extra
    # transposes only cost on the training path, which remats anyway).
    # The forward runs ONCE here, with save_lse; the backward consumes the
    # saved (o, lse) residuals directly via _flash_bwd — no nested
    # custom_vjp whose own forward would re-run flash a second time.
    n, lq, hd = q.shape
    d = hd // heads
    tr = lambda x: x.reshape(n, -1, heads, d).transpose(0, 2, 1, 3)
    qt, kt, vt = tr(q), tr(k), tr(v)
    out, lse = _flash_fwd(qt, kt, vt, scale, block_q, block_k, interpret,
                          save_lse=True)
    # Name the kernel residuals so a remat policy can save them across the
    # per-layer checkpoint boundary (save_only_these_names("flash_out",
    # "flash_lse") in models/unet3d.py) — the backward segment then reuses
    # them instead of re-running the flash forward. q/k/v residuals stay
    # rematted (cheap projection dots; saving them would triple the cost).
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    out_nlhd = out.transpose(0, 2, 1, 3).reshape(n, lq, hd)
    return out_nlhd, (qt, kt, vt, out, lse)


def _nlhd_vjp_bwd(heads, scale, block_q, block_k, interpret, res, g):
    qt, kt, vt, o, lse = res
    n, h, lq, d = qt.shape
    gt = g.reshape(n, lq, h, d).transpose(0, 2, 1, 3)
    dq, dk, dv = _flash_bwd(qt, kt, vt, o, lse, gt, scale, block_q, block_k,
                            interpret)
    un = lambda x: x.transpose(0, 2, 1, 3).reshape(n, x.shape[2], h * d)
    return un(dq), un(dk), un(dv)


_flash_attention_nlhd.defvjp(_nlhd_vjp_fwd, _nlhd_vjp_bwd)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref,
                   dq_scr, *, scale: float, kv_len: int, block_k: int,
                   num_kv_blocks: int):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    q = q_ref[0, 0]                # (bq, d)
    k = k_ref[0, 0]                # (bk, d)
    v = v_ref[0, 0]                # (bk, d)
    do = do_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, 0:1]    # (bq, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if kv_len % block_k != 0:
        col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
               + kv_idx * block_k)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)                                      # (bq, bk)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    di = jnp.sum(do * o, axis=1, keepdims=True)               # (bq, 1)
    ds = p * (dp - di) * scale
    dq_scr[...] += jax.lax.dot(ds.astype(k.dtype), k,
                               preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float,
                    q_len: int, block_q: int, num_q_blocks: int):
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    q = q_ref[0, 0]                # (bq, d)
    k = k_ref[0, 0]                # (bk, d)
    v = v_ref[0, 0]                # (bk, d)
    do = do_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, 0:1]    # (bq, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)
    if q_len % block_q != 0:
        # padded q rows carry lse=0 garbage — zero their contribution
        row = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
               + q_idx * block_q)
        p = jnp.where(row < q_len, p, 0.0)
    # dv += p^T @ do   (contract over bq, no explicit transpose)
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    di = jnp.sum(do * o, axis=1, keepdims=True)
    ds = p * (dp - di) * scale
    # dk += ds^T @ q
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, g, scale, block_q, block_k, interpret):
    """FlashAttention-2 backward. q/k/v/o/g: (N, H, L, D); lse lane-replicated
    (N, H, Lq_p, 128) from the forward. Returns (dq, dk, dv)."""
    n, h, lq, d = q.shape
    lk = k.shape[2]
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    if pad_q:
        padq = ((0, 0), (0, 0), (0, pad_q), (0, 0))
        q, o, g = jnp.pad(q, padq), jnp.pad(o, padq), jnp.pad(g, padq)
    if pad_k:
        padk = ((0, 0), (0, 0), (0, pad_k), (0, 0))
        k, v = jnp.pad(k, padk), jnp.pad(v, padk)
    lq_p, lk_p = lq + pad_q, lk + pad_k
    num_q_blocks, num_kv_blocks = lq_p // block_q, lk_p // block_k

    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda n, h, a, b: (n, h, a, 0))
    kv_spec_q = pl.BlockSpec((1, 1, block_k, d), lambda n, h, a, b: (n, h, b, 0))
    lse_spec = pl.BlockSpec((1, 1, block_q, 128), lambda n, h, a, b: (n, h, a, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=lk,
                          block_k=block_k, num_kv_blocks=num_kv_blocks),
        grid=(n, h, num_q_blocks, num_kv_blocks),
        in_specs=[q_spec, kv_spec_q, kv_spec_q, q_spec, q_spec, lse_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, lq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * h * lq_p * lk_p * d,
            bytes_accessed=(3 * q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=n * h * lq_p * lk_p,
        ),
        interpret=interpret,
    )(q, k, v, g, o, lse)

    # dkv sweep: kv blocks outer ("parallel"), q blocks inner accumulation
    q_spec_i = pl.BlockSpec((1, 1, block_q, d), lambda n, h, a, b: (n, h, b, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, d), lambda n, h, a, b: (n, h, a, 0))
    lse_spec_i = pl.BlockSpec((1, 1, block_q, 128),
                              lambda n, h, a, b: (n, h, b, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, q_len=lq,
                          block_q=block_q, num_q_blocks=num_q_blocks),
        grid=(n, h, num_kv_blocks, num_q_blocks),
        in_specs=[q_spec_i, kv_spec, kv_spec, q_spec_i, q_spec_i, lse_spec_i],
        out_specs=[kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct((n, h, lk_p, d), k.dtype),
                   jax.ShapeDtypeStruct((n, h, lk_p, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * h * lq_p * lk_p * d,
            bytes_accessed=(3 * q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=n * h * lq_p * lk_p,
        ),
        interpret=interpret,
    )(q, k, v, g, o, lse)

    if pad_q:
        dq = dq[:, :, :lq]
    if pad_k:
        dk, dv = dk[:, :, :lk], dv[:, :, :lk]
    return dq, dk, dv


def _vjp_fwd(q, k, v, scale, block_q, block_k, interpret):
    out, lse = _flash_fwd(q, k, v, scale, block_q, block_k, interpret,
                          save_lse=True)
    return out, (q, k, v, out, lse)


def _vjp_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd(q, k, v, o, lse, g, scale, block_q, block_k, interpret)


_flash_attention_nhld.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# packed-head variant: inputs stay (N, L, H*D); heads sliced on the lane dim
# inside the kernel — no (N, H, L, D) transposes (they cost ~25% of the call
# at 189 MB tensors).
# ---------------------------------------------------------------------------

def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                       scale: float, kv_len: int, block_k: int,
                       num_kv_blocks: int, d: int):
    kv_idx = pl.program_id(3)
    hd = pl.program_id(1) * d

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0, :, pl.ds(hd, d)]          # (bq, d)
    k = k_ref[0, :, pl.ds(hd, d)]          # (bk, d)
    v = v_ref[0, :, pl.ds(hd, d)]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    if kv_len % block_k != 0:
        col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
               + kv_idx * block_k)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, 0:1])
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next
    acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_scr[...][:, 0:1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, :, pl.ds(hd, d)] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _flash_fwd_packed(q, k, v, heads, scale, block_q, block_k, interpret):
    """q, k, v: (N, L, H*D) -> (N, Lq, H*D)."""
    n, lq, hd_all = q.shape
    lk = k.shape[1]
    d = hd_all // heads

    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    lq_p, lk_p = lq + pad_q, lk + pad_k
    num_kv_blocks = lk_p // block_k

    grid = (n, heads, lq_p // block_q, num_kv_blocks)
    kernel = functools.partial(
        _fwd_kernel_packed, scale=scale, kv_len=lk, block_k=block_k,
        num_kv_blocks=num_kv_blocks, d=d)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd_all), lambda n, h, qi, ki: (n, qi, 0)),
            pl.BlockSpec((1, block_k, hd_all), lambda n, h, qi, ki: (n, ki, 0)),
            pl.BlockSpec((1, block_k, hd_all), lambda n, h, qi, ki: (n, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd_all),
                               lambda n, h, qi, ki: (n, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n, lq_p, hd_all), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * heads * lq_p * lk_p * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=n * heads * lq_p * lk_p,
        ),
        interpret=interpret,
    )(q, k, v)
    if pad_q:
        out = out[:, :lq]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention_packed(q, k, v, heads, scale, block_q, block_k,
                            interpret):
    return _flash_fwd_packed(q, k, v, heads, scale, block_q, block_k,
                             interpret)


# Under differentiation the packed path shares the nlhd vjp: a head-major
# flash forward with fused lse residual, then _flash_bwd on the residuals.
# (Previously this fell back to _xla_ref's vjp, which materializes the full
# (Lq, Lk) logits matrix — an OOM trap at 9216 tokens the moment training
# ran with packed=True.)
_flash_attention_packed.defvjp(_nlhd_vjp_fwd, _nlhd_vjp_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
    packed: bool = False,   # packed-head path: awaits Mosaic support for
                            # 64-lane-offset slicing (fails to compile on
                            # current v5e toolchain); transposed path default
) -> jax.Array:
    """Attention over (..., L, H, D) inputs (same convention as
    ops.attention.dot_product_attention)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch_shape = q.shape[:-3]
    lq, heads, d = q.shape[-3:]
    lk = k.shape[-3]
    n = 1
    for s in batch_shape:
        n *= s
    round128 = lambda x: ((x + 127) // 128) * 128
    if block_q == DEFAULT_BLOCK_Q and lq > 4096:
        # profiled at L=9216 ×5h: bq=1024 25.1 ms vs bq=512 26.8 ms
        block_q = 1024
        if block_k == DEFAULT_BLOCK_K and lk % 2304 == 0:
            # r3 sweep at L=9216 b=32: bk=2304 50.7 ms vs bk=1024 53.7 —
            # exact division skips the padded-KV mask + fewer rescales
            block_k = 2304
    block_q = min(block_q, round128(lq))
    if lk <= 2560:
        # single-KV-block: skips all online-softmax correction passes
        # (measured 9.7 vs 10.8 ms at L=2560x5h on v5e)
        block_k = round128(lk)
    else:
        block_k = min(block_k, round128(lk))

    if packed:
        # (..., L, H, D) -> (N, L, H*D): reshape only, no transpose
        qr = q.reshape(n, lq, heads * d)
        kr = k.reshape(n, lk, heads * d)
        vr = v.reshape(n, lk, heads * d)
        out = _flash_attention_packed(qr, kr, vr, heads, scale, block_q,
                                      block_k, interpret)
        return out.reshape(*batch_shape, lq, heads, d)

    # default: transpose-free (N, L, H*D) layout — heads are d-lane value
    # slices in-kernel; the backward reuses the head-major lse path
    qr = q.reshape(n, lq, heads * d)
    kr = k.reshape(n, lk, heads * d)
    vr = v.reshape(n, lk, heads * d)
    out = _flash_attention_nlhd(qr, kr, vr, heads, scale, block_q, block_k,
                                interpret)
    return out.reshape(*batch_shape, lq, heads, d)
