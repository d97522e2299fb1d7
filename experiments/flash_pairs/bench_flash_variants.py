"""Diagnose where flash-forward time goes at the model's hot shapes.

Variants of the nlhd kernel:
  * nlhd      — shipped kernel (exp-based online softmax)
  * exp2      — softmax arithmetic in base-2 (exp2 VPU primitive)
  * nosoftmax — matmuls only (s -> clip -> pv); NOT correct attention,
                just the MXU-time lower bound for the same data movement
Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/bench_flash_variants.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamicrafter_tpu.ops.flash_attention import (
    _flash_attention_nlhd, _NEG_INF)
from dynamicrafter_tpu.utils.timing import time_chained

LOG2E = float(np.log2(np.e))


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            heads, d, scale, kv_len, block_k, num_kv_blocks, mode):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    col = jax.lax.broadcasted_iota(
        jnp.int32, (q.shape[0], block_k), 1) + kv_idx * block_k
    pad_cols = kv_len % block_k != 0
    eff_scale = scale * (LOG2E if mode == "exp2" else 1.0)
    for hh in range(heads):
        lanes = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            q[:, lanes], k[:, lanes], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * eff_scale
        if pad_cols:
            s = jnp.where(col < kv_len, s, _NEG_INF)
        if mode == "nosoftmax":
            p = jnp.clip(s, -1.0, 1.0)
            acc_scr[hh] += jax.lax.dot(
                p.astype(v.dtype), v[:, lanes],
                preferred_element_type=jnp.float32)
            l_scr[hh] = jnp.ones_like(l_scr[hh])
            continue
        ex = jnp.exp2 if mode == "exp2" else jnp.exp
        m_prev = m_scr[hh]
        l_prev = l_scr[hh]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = ex(m_prev - m_next)
        p = ex(s - m_next[:, 0:1])
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


def run_variant(q, k, v, heads, scale, block_q, block_k, mode):
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
        functools.partial(_kernel, heads=heads, d=d, scale=scale, kv_len=lk,
                          block_k=block_k, num_kv_blocks=num_kv_blocks,
                          mode=mode),
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
    )(q, k, v)
    if pad_q:
        out = out[:, :lq]
    return out


CASES = [
    ("512 ds1  L=2560 H=5 ", 32, 2560, 5, 512, 2560),
    ("1024 ds1 L=9216 H=5 ", 32, 9216, 5, 1024, 2304),
    ("1024 ds2 L=2304 H=10", 32, 2304, 10, 512, 2304),
]

rng = np.random.default_rng(0)
print("backend:", jax.default_backend())
for label, n, L, H, bq, bk in CASES:
    hd = H * 64
    q = jnp.array(rng.standard_normal((n, L, hd)), jnp.bfloat16) * 0.3
    k = jnp.array(rng.standard_normal((n, L, hd)), jnp.bfloat16) * 0.3
    v = jnp.array(rng.standard_normal((n, L, hd)), jnp.bfloat16)
    scale = 64 ** -0.5
    flops = 4 * n * H * L * L * 64

    def step0(c, k, v):
        return _flash_attention_nlhd(c, k, v, H, scale, bq, bk, False)
    t = time_chained(step0, q, iters=10, args=(k, v))
    print(f"{label} shipped    : {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TFLOP/s")

    for mode in ("exp", "exp2", "nosoftmax"):
        def step(c, k, v, mode=mode):
            return run_variant(c, k, v, H, scale, bq, bk, mode)
        t = time_chained(step, q, iters=10, args=(k, v))
        print(f"{label} {mode:11s}: {t*1e3:8.2f} ms  "
              f"{flops/t/1e12:6.1f} TFLOP/s")
