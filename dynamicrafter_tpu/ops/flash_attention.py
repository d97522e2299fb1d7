"""Pallas TPU flash attention (forward) with online softmax.

Replaces the reference's xformers memory_efficient_attention fast path
(lvdm/modules/attention.py:146-209) for the big spatial self-attention
(up to 72*128 = 9216 tokens at 1024-res). O(L) memory: the (Lq, Lk) scores
matrix is never materialized; running max/sum/acc live in VMEM scratch.

Backward currently recomputes attention through the XLA path via custom_vjp
(training additionally uses remat); dedicated dq/dkv kernels are a later
optimization.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                scale: float, kv_len: int, block_k: int, num_kv_blocks: int):
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


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    """q, k, v: (N, H, L, D) -> (N, H, Lq, D)."""
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
        num_kv_blocks=num_kv_blocks,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda n, h, qi, ki: (n, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda n, h, qi, ki: (n, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda n, h, qi, ki: (n, h, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda n, h, qi, ki: (n, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, lq_p, d), q.dtype),
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
    if pad_q:
        out = out[:, :, :lq]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_nhld(q, k, v, scale, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, scale, block_q, block_k, interpret)


def _xla_ref(q, k, v, scale):
    s = jnp.einsum("nhqd,nhkd->nhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhqk,nhkd->nhqd", p.astype(v.dtype), v).astype(q.dtype)


def _vjp_fwd(q, k, v, scale, block_q, block_k, interpret):
    out = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v)


def _vjp_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_ref(q_, k_, v_, scale), q, k, v)
    return vjp(g)


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


def _packed_vjp_fwd(q, k, v, heads, scale, block_q, block_k, interpret):
    out = _flash_fwd_packed(q, k, v, heads, scale, block_q, block_k, interpret)
    return out, (q, k, v)


def _packed_vjp_bwd(heads, scale, block_q, block_k, interpret, res, g):
    q, k, v = res
    d = q.shape[-1] // heads

    def ref(q_, k_, v_):
        split = lambda t: t.reshape(*t.shape[:-1], heads, d)
        n, lq = q_.shape[:2]
        o = _xla_ref(split(q_).transpose(0, 2, 1, 3),
                     split(k_).transpose(0, 2, 1, 3),
                     split(v_).transpose(0, 2, 1, 3), scale)
        return o.transpose(0, 2, 1, 3).reshape(n, lq, heads * d)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash_attention_packed.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


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

    # fallback: (N, H, L, D) layout with explicit transposes
    qr = q.reshape(n, lq, heads, d).transpose(0, 2, 1, 3)
    kr = k.reshape(n, lk, heads, d).transpose(0, 2, 1, 3)
    vr = v.reshape(n, lk, heads, d).transpose(0, 2, 1, 3)
    out = _flash_attention_nhld(qr, kr, vr, scale, block_q, block_k, interpret)
    return out.transpose(0, 2, 1, 3).reshape(*batch_shape, lq, heads, d)
