"""Benchmark: 16-frame clips/min/chip at 320x512 + e2e seconds at 576x1024.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Baselines (BASELINE.md, reference README.md:292-296 on A100):
  320x512: 20 s/clip  => 3.0 clips/min; vs_baseline = ours / 3.0
  576x1024: 75 s/clip (detail field vs_baseline_1024 = 75 / ours)

Measures the REAL jitted pipeline stages with chained-dependency timing
(utils/timing.py — naive dispatch timing reads ~0 under tunneled TPU
backends):
  * conditioning: CLIP text (cond+uncond) + CLIP vision + Resampler + VAE
    encode of the conditioning frame (once per clip)
  * 50-step DDIM lax.scan, batched 2-pass CFG at 512 / sequential CFG at
    1024 (single-chip memory fallback), bf16
  * per-frame VAE decode
Weights are RANDOM bf16 (scale 0.02) — identical FLOPs/memory to trained
weights, and random values keep XLA from algebraically simplifying dots the
way all-zero constants could.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEPS = 50


def _random_params(module, *args, **kwargs):
    import functools

    import jax
    import jax.numpy as jnp

    init = module.init
    if "method" in kwargs:  # non-array kwarg must be bound before eval_shape
        init = functools.partial(init, method=kwargs.pop("method"))
    shapes = jax.eval_shape(init, jax.random.PRNGKey(0), *args,
                            **kwargs)["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    vals = [jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02
            for k, s in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, vals)


def _bench_conditioning(mc, b, h, w, dtype):
    """Time the once-per-clip conditioning stage: CLIP text x2 (prompt +
    null), CLIP vision + Resampler on the cond frame, VAE encode."""
    import jax.numpy as jnp

    from dynamicrafter_tpu.models.clip import (
        CLIPTextConfig, CLIPTextEncoder, CLIPVisionConfig, CLIPVisionEncoder,
        clip_preprocess,
    )
    from dynamicrafter_tpu.models.resampler import Resampler, ResamplerConfig
    from dynamicrafter_tpu.models.vae import AutoencoderKL, VAEConfig
    from dynamicrafter_tpu.utils.timing import time_once

    text = CLIPTextEncoder(CLIPTextConfig(**mc.clip_text), dtype=dtype)
    vision = CLIPVisionEncoder(CLIPVisionConfig(**mc.clip_vision), dtype=dtype)
    res = Resampler(ResamplerConfig.from_dict(mc.resampler), dtype=dtype)
    vae = AutoencoderKL(VAEConfig.from_dict(mc.vae), dtype=dtype)

    import jax

    tokens = jax.random.randint(jax.random.PRNGKey(1), (2 * b, 77), 0, 49408)
    img = jax.random.normal(jax.random.PRNGKey(2), (b, 8 * h, 8 * w, 3), dtype)
    img_size = vision.config.image_size
    px = jnp.zeros((b, img_size, img_size, 3), dtype)
    n_patches = (img_size // vision.config.patch_size) ** 2 + 1

    tparams = _random_params(text, tokens)
    vparams = _random_params(vision, px)
    rparams = _random_params(
        res, jnp.zeros((b, n_patches, res.config.embedding_dim), dtype))
    eparams = _random_params(vae, jnp.zeros((1, 64, 64, 3), dtype),
                             method=AutoencoderKL.encode_moments)

    def cond_stage(tp, vp, rp, ep, tokens, img):
        txt = text.apply({"params": tp}, tokens)
        pixels = clip_preprocess(img, img_size)
        vis_tokens = vision.apply({"params": vp}, pixels.astype(dtype))
        img_ctx = res.apply({"params": rp}, vis_tokens)
        moments = vae.apply({"params": ep}, img,
                            method=AutoencoderKL.encode_moments)
        return txt, img_ctx, moments

    return time_once(cond_stage, tparams, vparams, rparams, eparams,
                     tokens, img, repeats=2)


def _bench_resolution(mc, b, h, w, steps, dtype, sequential_cfg,
                      with_conditioning, cfg_both=False,
                      perframe_decode=True):
    import jax.numpy as jnp

    from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
    from dynamicrafter_tpu.models.vae import Decoder, VAEConfig
    from dynamicrafter_tpu.sampling.ddim import (
        CFGConditioning, SamplerSettings, ddim_sample, make_cfg_denoiser,
    )
    from dynamicrafter_tpu import schedule as sched_lib
    from dynamicrafter_tpu.utils.timing import time_once

    unet_cfg = UNetConfig.from_dict(mc.unet)
    vae_cfg = VAEConfig.from_dict(mc.vae)
    t_len = unet_cfg.temporal_length
    unet = UNetModel(unet_cfg, dtype=dtype)
    n_img_tok = (mc.resampler or {}).get("num_queries", 16)

    import jax

    # Conditioning is RANDOM and passed as RUNTIME args to the scan (not
    # captured constants): zeros-valued closures are one constant-folding
    # compiler upgrade away from silently benchmarking a hollow model.
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    zc = vae_cfg.z_channels
    x = jax.random.normal(keys[0], (b, t_len, h, w, zc), dtype)
    ctx_dim = unet_cfg.context_dim
    cond = CFGConditioning(
        context_text=jax.random.normal(
            keys[1], (2, b, 77, ctx_dim), dtype) * 0.1,
        context_img=jax.random.normal(
            keys[2], (2, b, t_len, n_img_tok, ctx_dim), dtype) * 0.1,
        concat=jax.random.normal(
            keys[3], (2, b, t_len, h, w, zc), dtype),
        fs=jnp.full((b,), 24, jnp.int32),
    )
    xfull = jnp.zeros((2 * b, t_len, h, w, 2 * zc), dtype)
    uparams = _random_params(
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
        guidance_rescale=0.7, parameterization=mc.parameterization,
        sequential_cfg=sequential_cfg)

    def unet_apply(p, xin, tsin, context_text, context_img, fs, **kw):
        return unet.apply({"params": p}, xin, tsin, context_text=context_text,
                          context_img=context_img, fs=fs, **kw)

    # Weights are passed as runtime args (the serving reality: weights live
    # in HBM, one executable serves any checkpoint). Baking them as
    # compile-time constants measured ~9% faster steps in round 1, but with
    # RANDOM weights XLA must lower 2.9 GB of literal data — compile blows
    # up from ~1 min to >30 min — so baking is opt-in (BENCH_BAKE=1).
    bake = os.environ.get("BENCH_BAKE", "0") == "1"
    if bake:
        def full_scan(c, x0):
            model_fn = make_cfg_denoiser(unet_apply, uparams, c, settings)
            return ddim_sample(model_fn, x0.astype(jnp.float32), schedule,
                               table, settings).astype(dtype)

        scan_seconds = time_once(full_scan, cond, x, repeats=2)
    else:
        def full_scan(params, c, x0):
            model_fn = make_cfg_denoiser(unet_apply, params, c, settings)
            return ddim_sample(model_fn, x0.astype(jnp.float32), schedule,
                               table, settings).astype(dtype)

        scan_seconds = time_once(full_scan, uparams, cond, x, repeats=2)

    alt_scan_seconds = None
    if cfg_both and not bake:
        import dataclasses as _dc

        alt = _dc.replace(settings, sequential_cfg=not sequential_cfg)

        def alt_scan(params, c, x0):
            model_fn = make_cfg_denoiser(unet_apply, params, c, alt)
            return ddim_sample(model_fn, x0.astype(jnp.float32), schedule,
                               table, alt).astype(dtype)

        alt_scan_seconds = time_once(alt_scan, uparams, cond, x, repeats=2)
        if alt_scan_seconds < scan_seconds:
            scan_seconds, alt_scan_seconds = alt_scan_seconds, scan_seconds
            sequential_cfg = not sequential_cfg

    decoder = Decoder(vae_cfg, dtype=dtype)
    dparams = _random_params(decoder, jnp.zeros((1, h, w, zc), dtype))

    def decode_1f(params, z):
        return decoder.apply({"params": params}, z)

    if perframe_decode:
        # per-frame decode (perframe_ae, reference ddpm3d.py:654-663); one
        # frame timed, multiplied by T (frames are independent)
        decode_seconds = t_len * time_once(
            decode_1f, dparams, jnp.zeros((1, h, w, zc), dtype), repeats=2)
    else:
        # batched decode of all T frames in one call (the reference's
        # perframe_ae=False mode, used for its 256x256 baseline)
        decode_seconds = time_once(
            decode_1f, dparams, jnp.zeros((t_len, h, w, zc), dtype),
            repeats=2)

    cond_seconds = (_bench_conditioning(mc, b, h, w, dtype)
                    if with_conditioning else 0.0)

    # decode_seconds is per CLIP (16 frames); conditioning and the scan are
    # one batched call covering all b clips. Per-clip e2e = total / b.
    total_seconds = cond_seconds + scan_seconds + b * decode_seconds
    out = {
        "batch": b,
        "cond_stage_s": round(cond_seconds, 3),
        "ddim50_cfg_scan_s": round(scan_seconds, 3),
        "unet_step_ms": round(scan_seconds / steps * 1000, 1),
        "vae_decode_16f_s": round(decode_seconds, 3),
        "e2e_clip_s": round(total_seconds / b, 2),
        "weights_baked": bake,
        "sequential_cfg": sequential_cfg,
    }
    if alt_scan_seconds is not None:
        out["ddim50_cfg_scan_alt_s"] = round(alt_scan_seconds, 3)

    # DeepCache accelerated sampling: reported as separate detail keys,
    # never as the headline (it is an approximation — different outputs
    # from the exact sampler, so not the parity workload). Default N=5 is
    # the CERTIFIED serving interval: >=90 dB latent / >=68 dB pixel PSNR
    # vs exact at full-size 256/512, both CFG modes (PARITY_RESULTS.md
    # "DeepCache quality"; scripts/deepcache_certify.py). BENCH_DEEPCACHE=0
    # disables, =N overrides.
    dc = int(os.environ.get("BENCH_DEEPCACHE", "5"))
    if dc > 1 and steps % dc != 0:
        dc = 0  # CPU-fallback tiny step counts: skip rather than crash
    if dc > 1 and not bake:
        import dataclasses as _dc2

        dc_settings = _dc2.replace(settings, deepcache=dc)

        def dc_scan(params, c, x0):
            model_fn = make_cfg_denoiser(unet_apply, params, c, dc_settings)
            return ddim_sample(model_fn, x0.astype(jnp.float32), schedule,
                               table, dc_settings).astype(dtype)

        dc_scan_seconds = time_once(dc_scan, uparams, cond, x, repeats=2)
        out[f"ddim50_deepcache{dc}_scan_s"] = round(dc_scan_seconds, 3)
        out[f"e2e_clip_s_deepcache{dc}"] = round(
            (cond_seconds + dc_scan_seconds + b * decode_seconds) / b, 2)

    # DPM-Solver++(2M) fast mode: exact-model sampling at a lower step
    # count (DDIM-50-class discretization error at ~30 steps, tests/
    # test_dpm.py). Detail rows only, never the headline (different step
    # count from the reference's DDIM-50 workload). BENCH_DPM=0 disables,
    # =N overrides the step count.
    dpm_steps = int(os.environ.get("BENCH_DPM", "30"))
    if dpm_steps > 1 and not bake:
        import dataclasses as _dc3

        from dynamicrafter_tpu.sampling.dpm import dpm_sample

        dpm_settings = _dc3.replace(settings, steps=dpm_steps, eta=0.0,
                                    sampler="dpm")
        dpm_table = sched_lib.build_ddim_table(
            schedule, num_steps=dpm_steps, discretize="uniform_trailing",
            eta=0.0)

        def dpm_scan(params, c, x0):
            model_fn = make_cfg_denoiser(unet_apply, params, c, dpm_settings)
            return dpm_sample(model_fn, x0.astype(jnp.float32), schedule,
                              dpm_table, dpm_settings).astype(dtype)

        dpm_scan_seconds = time_once(dpm_scan, uparams, cond, x, repeats=2)
        out[f"dpm{dpm_steps}_cfg_scan_s"] = round(dpm_scan_seconds, 3)
        out[f"e2e_clip_s_dpm{dpm_steps}"] = round(
            (cond_seconds + dpm_scan_seconds + b * decode_seconds) / b, 2)
    return out


def main():
    import jax

    # Persistent compile cache: the tunneled remote compiler takes ~10+ min
    # per full-size module; caching makes repeat bench runs compile-free.
    # Must go through jax.config — the axon sitecustomize plugin imports
    # jax at interpreter startup, so env vars set here bind too late
    # (same fix as __graft_entry__.py). Timing is unaffected: time_once
    # excludes the first (compiling) call from its measurement.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_dctpu_tests")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from dynamicrafter_tpu.config import ModelConfig

    on_tpu = jax.default_backend() == "tpu"
    import jax.numpy as jnp
    dtype = jnp.bfloat16
    here = os.path.dirname(os.path.abspath(__file__))

    if on_tpu:
        mc512 = ModelConfig.from_yaml(
            os.path.join(here, "configs", "inference_512_v1.0.yaml"))
        d512 = _bench_resolution(mc512, 1, 40, 64, STEPS, dtype,
                                 sequential_cfg=False, with_conditioning=True)
        detail = dict(d512)
        if os.environ.get("BENCH_SKIP_1024", "0") != "1":
            mc1024 = ModelConfig.from_yaml(
                os.path.join(here, "configs", "inference_1024_v1.0.yaml"))
            d1024 = _bench_resolution(mc1024, 1, 72, 128, STEPS, dtype,
                                      sequential_cfg=True,
                                      with_conditioning=True, cfg_both=True)
            detail["clip_1024_s"] = d1024["e2e_clip_s"]
            detail["cond_stage_1024_s"] = d1024["cond_stage_s"]
            detail["unet_step_1024_ms"] = d1024["unet_step_ms"]
            detail["sequential_cfg_1024"] = d1024["sequential_cfg"]
            if "ddim50_cfg_scan_alt_s" in d1024:
                detail["ddim50_cfg_scan_1024_alt_s"] = \
                    d1024["ddim50_cfg_scan_alt_s"]
            detail["vae_decode_1024_16f_s"] = d1024["vae_decode_16f_s"]
            for k, v in d1024.items():
                if "deepcache" in k or "dpm" in k:
                    detail[f"{k}_1024"] = v
            # A100 reference: 75 s/clip at 576x1024 (README.md:292-294)
            detail["vs_baseline_1024"] = round(75.0 / detail["clip_1024_s"], 3)
        if os.environ.get("BENCH_256", "0") == "1":
            # opt-in (keeps the driver's default bench run short): the
            # reference's third headline row — 256x256, DDIM-50,
            # perframe_ae=False i.e. batched decode, 10 s/clip on A100
            # (README.md:296)
            mc256 = ModelConfig.from_yaml(
                os.path.join(here, "configs", "inference_256_v1.0.yaml"))
            d256 = _bench_resolution(mc256, 1, 32, 32, STEPS, dtype,
                                     sequential_cfg=False,
                                     with_conditioning=True,
                                     perframe_decode=False)
            detail["clip_256_s"] = d256["e2e_clip_s"]
            detail["unet_step_256_ms"] = d256["unet_step_ms"]
            detail["vs_baseline_256"] = round(10.0 / d256["e2e_clip_s"], 3)
        bb = int(os.environ.get("BENCH_BATCH", "0"))
        if bb > 1:
            # opt-in: throughput-optimized serving at 320x512 — b clips per
            # batched-CFG scan (UNet batch 2b) amortizes the per-step weight
            # reads; per-clip e2e = total / b (see _bench_resolution)
            dbb = _bench_resolution(mc512, bb, 40, 64, STEPS, dtype,
                                    sequential_cfg=False,
                                    with_conditioning=True)
            detail[f"clip_512_s_b{bb}"] = dbb["e2e_clip_s"]
            detail[f"clips_per_min_b{bb}"] = round(60.0 / dbb["e2e_clip_s"],
                                                   3)
        metric = "clips_per_min_per_chip_320x512"
    else:
        from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG

        mc = ModelConfig(TINY_MODEL_CONFIG)
        detail = _bench_resolution(mc, 1, 8, 8, 4, dtype,
                                   sequential_cfg=False,
                                   with_conditioning=False)
        metric = "clips_per_min_per_chip_320x512_CPU_FALLBACK"

    clip_seconds = detail["e2e_clip_s"]
    clips_per_min = 60.0 / clip_seconds
    baseline = 3.0  # A100 reference: 20 s/clip @ 320x512
    detail["backend"] = jax.default_backend()

    # Fidelity-gate visibility: the PSNR>40 check needs released weights; if
    # they are mounted we say where, else ONE actionable line on stderr
    # (stdout stays a single JSON line for the driver).
    from dynamicrafter_tpu.utils.discovery import discover

    found, blocked = discover("512")
    detail["fidelity_gate"] = (found["checkpoint"] or "blocked")
    if blocked:
        print(blocked, file=sys.stderr)

    print(json.dumps({
        "metric": metric,
        "value": round(clips_per_min, 3),
        "unit": "clips/min/chip",
        "vs_baseline": round(clips_per_min / baseline, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
