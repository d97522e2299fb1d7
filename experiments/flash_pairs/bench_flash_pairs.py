"""Microbench: pair-packed (d=64) flash forward vs the nlhd value-slicing
kernel, at the model's hot self-attention shapes.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/flash_pairs/bench_flash_pairs.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from dynamicrafter_tpu.ops.flash_attention import _flash_attention_nlhd
from experiments.flash_pairs.flash_pairs import (
    flash_attention_pairs as _flash_attention_pairs)
from dynamicrafter_tpu.utils.timing import time_chained

print("backend:", jax.default_backend())

# (label, n, L, H): ds1@512, ds1@1024, ds2@1024 — all b=2 batched CFG, T=16
CASES = [
    ("512 ds1  L=2560 H=5 ", 32, 2560, 5),
    ("1024 ds1 L=9216 H=5 ", 32, 9216, 5),
    ("1024 ds2 L=2304 H=10", 32, 2304, 10),
]

rng = np.random.default_rng(0)
for label, n, L, H in CASES:
    hd = H * 64
    q = jnp.array(rng.standard_normal((n, L, hd)), jnp.bfloat16) * 0.3
    k = jnp.array(rng.standard_normal((n, L, hd)), jnp.bfloat16) * 0.3
    v = jnp.array(rng.standard_normal((n, L, hd)), jnp.bfloat16)
    scale = 64 ** -0.5
    # block tuning mirrors flash_attention()'s dispatch
    if L > 4096:
        bq, bks = 1024, [1024, 2304]
    else:
        bq, bks = 512, [min(1024, ((L + 127) // 128) * 128)]

    def step_nlhd(c, k, v):
        return _flash_attention_nlhd(c, k, v, H, scale, bq,
                                     bks[-1] if L > 4096 else bks[0], False)

    t0 = time_chained(step_nlhd, q, iters=10, args=(k, v))
    flops = 4 * n * H * L * L * 64
    print(f"{label} nlhd          : {t0*1e3:8.2f} ms  "
          f"{flops/t0/1e12:6.1f} TFLOP/s")
    for bk in bks:
        for bq_p in ({512, 1024} if L > 4096 else {bq}):
            def step_pairs(c, k, v, bq_p=bq_p, bk=bk):
                return _flash_attention_pairs(c, k, v, H, scale, bq_p, bk,
                                              False)
            t1 = time_chained(step_pairs, q, iters=10, args=(k, v))
            print(f"{label} pairs bq={bq_p:4d} bk={bk:4d}: {t1*1e3:8.2f} ms  "
                  f"{flops/t1/1e12:6.1f} TFLOP/s   ({t0/t1:.2f}x)")
