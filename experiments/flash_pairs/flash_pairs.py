"""RETIRED EXPERIMENT — pair-packed (d=64) flash-attention forward.

Premise: at head_dim=64 both flash matmuls half-fill the 128-wide MXU
(QK^T contracts over 64 lanes; PV emits 64 output lanes), so packing head
pairs into 128 lanes with block-diagonal (2*bk, 128) K/V should ~2x the
MXU utilization. See README.md here for why that premise is WRONG on v5e
(Mosaic already runs d=64 contractions near full rate) and the measured
numbers. Forward-only; correctness verified in interpret mode vs
ops.attention.xla_attention (max err < 1e-6 incl. odd H and padding).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamicrafter_tpu.ops.flash_attention import _NEG_INF


# ---------------------------------------------------------------------------
# pair-packed variant (d=64): two heads share one 128-lane MXU tile.
#
# At d=64 both flash matmuls half-fill the MXU: QK^T contracts over 64
# (half the 128-deep systolic array) and PV emits 64 output lanes (half its
# width). Packing head pairs side by side in the natural (N, L, H*64) layout
# and expanding K/V blocks to BLOCK-DIAGONAL (2*bk, 128) form in VMEM turns
# both into single full-width matmuls:
#
#   q128 = [Q1 | Q2]                 (bq, 128)
#   k_bd = [[K1 | 0], [0 | K2]]      (2bk, 128)   rows 0:bk / bk:2bk
#   s    = q128 @ k_bd^T             (bq, 2bk) = [Q1K1^T | Q2K2^T]
#   v_bd = [[V1 | 0], [0 | V2]]      (2bk, 128)
#   o    = p @ v_bd                  (bq, 128) = [P1V1 | P2V2]
#
# The cross terms vanish through the zero blocks, the two online softmaxes
# run on lane-aligned halves of s, and every block offset is 128-aligned —
# which is what the earlier 64-lane-offset `packed` kernel was missing on
# Mosaic. Building k_bd/v_bd costs O(bk*128) VPU selects per grid cell,
# negligible against the bq*2bk*128 MACs they unlock.
# ---------------------------------------------------------------------------


def _fwd_kernel_pairs(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                      scale: float, kv_len: int, block_k: int,
                      num_kv_blocks: int, d: int, num_pairs: int,
                      odd_heads: bool):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0]               # (bq, 2d) = [Q1 | Q2]
    k = k_ref[0]               # (bk, 2d)
    v = v_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    lo = lane < d
    hi = lane >= d
    if odd_heads:
        # last pair's upper head is lane padding: zero its K/V so the
        # padded lanes cannot inject non-finite values into the packed
        # matmuls (o2 of this pair is discarded by the caller's slice).
        real_hi = pl.program_id(1) != num_pairs - 1
        hi = jnp.logical_and(hi, real_hi)
    k_bd = jnp.concatenate(
        [jnp.where(lo, k, 0), jnp.where(hi, k, 0)], axis=0)   # (2bk, 2d)
    v_bd = jnp.concatenate(
        [jnp.where(lo, v, 0), jnp.where(hi, v, 0)], axis=0)

    s = jax.lax.dot_general(
        q, k_bd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                  # (bq, 2bk) = [S1 | S2]

    if kv_len % block_k != 0:
        col = (jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], block_k), 1)
               + kv_idx * block_k)
        pad = jnp.where(col < kv_len, 0.0, _NEG_INF)
        s = s + jnp.concatenate([pad, pad], axis=1)

    s1, s2 = s[:, :block_k], s[:, block_k:]
    m1_prev, m2_prev = m_scr[0], m_scr[1]                 # (bq, 128)
    m1_next = jnp.maximum(m1_prev, jnp.max(s1, axis=1, keepdims=True))
    m2_next = jnp.maximum(m2_prev, jnp.max(s2, axis=1, keepdims=True))
    alpha1 = jnp.exp(m1_prev - m1_next)
    alpha2 = jnp.exp(m2_prev - m2_next)
    p1 = jnp.exp(s1 - m1_next[:, 0:1])
    p2 = jnp.exp(s2 - m2_next[:, 0:1])
    l_scr[0] = alpha1 * l_scr[0] + jnp.sum(p1, axis=1, keepdims=True)
    l_scr[1] = alpha2 * l_scr[1] + jnp.sum(p2, axis=1, keepdims=True)
    m_scr[0] = m1_next
    m_scr[1] = m2_next

    lane_q = jax.lax.broadcasted_iota(jnp.int32, acc_scr.shape, 1)
    alpha_pack = jnp.where(lane_q < d, alpha1[:, 0:1], alpha2[:, 0:1])
    p = jnp.concatenate([p1, p2], axis=1)                 # (bq, 2bk)
    acc_scr[...] = acc_scr[...] * alpha_pack + jax.lax.dot(
        p.astype(v.dtype), v_bd, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_pack = jnp.where(lane_q < d, l_scr[0][:, 0:1], l_scr[1][:, 0:1])
        l_inv = jnp.where(l_pack == 0.0, 1.0, 1.0 / l_pack)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _flash_fwd_pairs(q, k, v, heads, scale, block_q, block_k, interpret):
    """q, k, v: (N, L, H*64) -> (N, Lq, H*64). Requires head_dim == 64."""
    n, lq, hd = q.shape
    d = hd // heads
    assert 2 * d == 128, "pairs kernel requires head_dim == 64"
    lk = k.shape[1]
    num_pairs = (heads + 1) // 2
    odd_heads = heads % 2 == 1

    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    pad_h = num_pairs * 2 * d - hd
    if pad_q or pad_h:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, pad_h)))
    if pad_k or pad_h:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, pad_h)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, pad_h)))
    lq_p, lk_p = lq + pad_q, lk + pad_k
    hd_p = hd + pad_h
    num_kv_blocks = lk_p // block_k

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_pairs, scale=scale, kv_len=lk, block_k=block_k,
            num_kv_blocks=num_kv_blocks, d=d, num_pairs=num_pairs,
            odd_heads=odd_heads),
        grid=(n, num_pairs, lq_p // block_q, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * d),
                         lambda n, h, qi, ki: (n, qi, h)),
            pl.BlockSpec((1, block_k, 2 * d),
                         lambda n, h, qi, ki: (n, ki, h)),
            pl.BlockSpec((1, block_k, 2 * d),
                         lambda n, h, qi, ki: (n, ki, h)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 2 * d),
                               lambda n, h, qi, ki: (n, qi, h)),
        out_shape=jax.ShapeDtypeStruct((n, lq_p, hd_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_q, 128), jnp.float32),
            pltpu.VMEM((2, block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 2 * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * heads * lq_p * lk_p * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=n * heads * lq_p * lk_p,
        ),
        interpret=interpret,
    )(q, k, v)
    if pad_q or pad_h:
        out = out[:, :lq, :hd]
    return out


def flash_attention_pairs(q, k, v, heads, scale, block_q, block_k,
                          interpret=False):
    return _flash_fwd_pairs(q, k, v, heads, scale, block_q, block_k,
                            interpret)
