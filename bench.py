"""Benchmark: 16-frame clips/min/chip at 320x512 (DDIM-50 + CFG + VAE decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference 320x512 inference = 20 s/clip on A100 (README.md:295)
=> 3.0 clips/min. vs_baseline = ours / 3.0.

Runs the real 512-architecture UNet in bf16 with batched-CFG denoise steps
plus per-frame VAE decode; weights are zeros (identical FLOPs/memory to
trained weights). On CPU (no TPU attached) it falls back to a tiny model so
the harness stays runnable, and marks the metric accordingly.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEPS = 50
T = 16


def _zero_params(module, *args, **kwargs):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *args, **kwargs)
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]


def _time(fn, *args, warmup=2, iters=5):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from dynamicrafter_tpu.config import ModelConfig
    from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
    from dynamicrafter_tpu.models.vae import Decoder, VAEConfig

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16

    if on_tpu:
        cfg_path = os.path.join(os.path.dirname(__file__),
                                "configs", "inference_512_v1.0.yaml")
        mc = ModelConfig.from_yaml(cfg_path)
        unet_cfg = UNetConfig.from_dict(mc.unet)
        vae_cfg = VAEConfig.from_dict(mc.vae)
        b, h, w = 2, 40, 64          # batched CFG at 320x512 latents
        metric = "clips_per_min_per_chip_320x512"
    else:
        from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG

        mc = ModelConfig(TINY_MODEL_CONFIG)
        unet_cfg = UNetConfig.from_dict(mc.unet)
        vae_cfg = VAEConfig.from_dict(mc.vae)
        b, h, w = 2, 8, 8
        metric = "clips_per_min_per_chip_320x512_CPU_FALLBACK"

    t_len = unet_cfg.temporal_length or T
    unet = UNetModel(unet_cfg, dtype=dtype)
    x = jnp.zeros((b, t_len, h, w, unet_cfg.in_channels), dtype)
    ts = jnp.zeros((b,), jnp.int32)
    n_img_tok = 16 if on_tpu else 4
    ctx_text = jnp.zeros((b, 77, unet_cfg.context_dim), dtype)
    ctx_img = jnp.zeros((b, t_len, n_img_tok, unet_cfg.context_dim), dtype)
    fs = jnp.full((b,), 24, jnp.int32)
    uparams = _zero_params(unet, x, ts, context_text=ctx_text,
                           context_img=ctx_img, fs=fs)

    @jax.jit
    def denoise_step(p, x):
        return unet.apply({"params": p}, x, ts, context_text=ctx_text,
                          context_img=ctx_img, fs=fs)

    step_time = _time(denoise_step, uparams, x)

    decoder = Decoder(vae_cfg, dtype=dtype)
    z1 = jnp.zeros((1, h, w, vae_cfg.z_channels), dtype)
    dparams = _zero_params(decoder, z1)

    @jax.jit
    def decode_frame(p, z):
        return decoder.apply({"params": p}, z)

    decode_time = _time(decode_frame, dparams, z1)

    clip_seconds = STEPS * step_time + t_len * decode_time
    clips_per_min = 60.0 / clip_seconds
    baseline_clips_per_min = 3.0  # A100 reference, 20 s/clip @ 512

    print(json.dumps({
        "metric": metric,
        "value": round(clips_per_min, 3),
        "unit": "clips/min/chip",
        "vs_baseline": round(clips_per_min / baseline_clips_per_min, 3),
        "detail": {
            "unet_step_ms": round(step_time * 1000, 2),
            "vae_decode_frame_ms": round(decode_time * 1000, 2),
            "e2e_clip_s": round(clip_seconds, 2),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
