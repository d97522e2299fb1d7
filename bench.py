"""Benchmark: 16-frame clips/min/chip at 320x512 (DDIM-50 + CFG + VAE decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Baseline: reference 320x512 inference = 20 s/clip on A100 (README.md:295)
=> 3.0 clips/min. vs_baseline = ours / 3.0 (higher is better).

Measures the REAL jitted 50-step DDIM lax.scan (batched 2-pass CFG through
the full 512-architecture UNet, bf16) plus per-frame VAE decode, using
chained-dependency timing (utils/timing.py) — naive dispatch timing reads ~0
under tunneled TPU backends. Weights are zeros: identical FLOPs/memory to
trained weights.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEPS = 50


def _zero_params(module, *args, **kwargs):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *args, **kwargs)
    # bf16 weight storage (norms too — zeros anyway): matches the deployed
    # inference config and halves per-step weight bandwidth
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)["params"]


def main():
    import jax
    import jax.numpy as jnp

    from dynamicrafter_tpu.config import ModelConfig
    from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
    from dynamicrafter_tpu.models.vae import Decoder, VAEConfig
    from dynamicrafter_tpu.sampling.ddim import (
        CFGConditioning, SamplerSettings, ddim_sample, make_cfg_denoiser,
    )
    from dynamicrafter_tpu import schedule as sched_lib
    from dynamicrafter_tpu.utils.timing import time_once

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16

    if on_tpu:
        cfg_path = os.path.join(os.path.dirname(__file__),
                                "configs", "inference_512_v1.0.yaml")
        mc = ModelConfig.from_yaml(cfg_path)
        b, h, w = 1, 40, 64
        n_img_tok = 16
        metric = "clips_per_min_per_chip_320x512"
        steps = STEPS
    else:
        from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG

        mc = ModelConfig(TINY_MODEL_CONFIG)
        b, h, w = 1, 8, 8
        n_img_tok = 4
        metric = "clips_per_min_per_chip_320x512_CPU_FALLBACK"
        steps = 4

    unet_cfg = UNetConfig.from_dict(mc.unet)
    vae_cfg = VAEConfig.from_dict(mc.vae)
    t_len = unet_cfg.temporal_length
    unet = UNetModel(unet_cfg, dtype=dtype)

    zc = vae_cfg.z_channels
    x = jnp.zeros((b, t_len, h, w, zc), dtype)
    ts0 = jnp.zeros((b,), jnp.int32)
    ctx_dim = unet_cfg.context_dim
    cond = CFGConditioning(
        context_text=jnp.zeros((2, b, 77, ctx_dim), dtype),
        context_img=jnp.zeros((2, b, t_len, n_img_tok, ctx_dim), dtype),
        concat=jnp.zeros((2, b, t_len, h, w, zc), dtype),
        fs=jnp.full((b,), 24, jnp.int32),
    )
    xfull = jnp.zeros((2 * b, t_len, h, w, 2 * zc), dtype)
    uparams = _zero_params(
        unet, xfull, jnp.zeros((2 * b,), jnp.int32),
        context_text=jnp.zeros((2 * b, 77, ctx_dim), dtype),
        context_img=jnp.zeros((2 * b, t_len, n_img_tok, ctx_dim), dtype),
        fs=jnp.zeros((2 * b,), jnp.int32))

    schedule = sched_lib.build_schedule(
        timesteps=mc.timesteps, linear_start=mc.linear_start,
        linear_end=mc.linear_end, parameterization=mc.parameterization,
        rescale_betas_zero_snr=mc.rescale_betas_zero_snr,
        use_dynamic_rescale=mc.use_dynamic_rescale, base_scale=mc.base_scale)
    table = sched_lib.build_ddim_table(
        schedule, num_steps=steps, discretize="uniform_trailing", eta=0.0)
    settings = SamplerSettings(
        steps=steps, discretize="uniform_trailing", eta=0.0, cfg_scale=7.5,
        guidance_rescale=0.7, parameterization=mc.parameterization)

    def unet_apply(p, xin, tsin, context_text, context_img, fs):
        return unet.apply({"params": p}, xin, tsin, context_text=context_text,
                          context_img=context_img, fs=fs)

    # Serving configuration: weights baked as compile-time constants — XLA
    # pre-formats weight layouts (~9% faster steps than arg-passed weights).
    # Set BENCH_NO_BAKE=1 to measure the arg-passed variant instead.
    bake = os.environ.get("BENCH_NO_BAKE", "0") != "1"
    if bake:
        def full_scan(x0):
            model_fn = make_cfg_denoiser(unet_apply, uparams, cond, settings)
            return ddim_sample(model_fn, x0.astype(jnp.float32), schedule,
                               table, settings).astype(dtype)

        scan_seconds = time_once(full_scan, x, repeats=2)
    else:
        def full_scan(params, x0):
            model_fn = make_cfg_denoiser(unet_apply, params, cond, settings)
            return ddim_sample(model_fn, x0.astype(jnp.float32), schedule,
                               table, settings).astype(dtype)

        scan_seconds = time_once(full_scan, uparams, x, repeats=2)

    decoder = Decoder(vae_cfg, dtype=dtype)
    z1 = jnp.zeros((1, h, w, zc), dtype)
    dparams = _zero_params(decoder, z1)

    def decode_16f(params, z):
        return decoder.apply({"params": params}, z)

    decode_seconds = time_once(
        decode_16f, dparams,
        jnp.zeros((t_len, h, w, zc), dtype), repeats=2)

    clip_seconds = scan_seconds + decode_seconds
    clips_per_min = 60.0 / clip_seconds
    baseline = 3.0  # A100 reference: 20 s/clip @ 320x512

    print(json.dumps({
        "metric": metric,
        "value": round(clips_per_min, 3),
        "unit": "clips/min/chip",
        "vs_baseline": round(clips_per_min / baseline, 3),
        "detail": {
            "ddim50_cfg_scan_s": round(scan_seconds, 3),
            "unet_step_ms": round(scan_seconds / steps * 1000, 1),
            "vae_decode_16f_s": round(decode_seconds, 3),
            "e2e_clip_s": round(clip_seconds, 2),
            "weights_baked": bake,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
