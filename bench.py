"""Benchmark: 16-frame clips/min/chip at 320x512 + e2e seconds at 576x1024.

Prints a JSON line {"metric", "value", "unit", "vs_baseline", "detail"}
after EVERY measured milestone (flushed); each line is a superset of the
previous one, so the driver's "last JSON line on stdout" is always the
richest result available when the process ends OR times out. The 320x512
headline lands on stdout within the first ~2 minutes of device time; a
timeout after that can no longer cost the round its numbers (round-4
lesson: the old all-at-the-end print produced rc=124, parsed=null).

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

Time budget: BENCH_BUDGET_S (default 2700) — optional rows (MFU,
DeepCache/DPM at 512) are skipped when the estimated cost would push wall
time past the budget; skipped rows are named in a `skipped` detail key
(the no-silent-caps rule). Estimates are compile-aware: the wall-vs-device
gap of each exact scan measures this process's actual compile cost (cache
hit => ~0), and optional-row estimates scale with it, so a cold-cache run
sheds optional work early instead of timing out. 1024 DeepCache/DPM/
alt-CFG rows are opt-in (BENCH_1024_EXTRAS=1) after round 4's default
workload outgrew the driver's timeout. Exact 512 + 1024 rows always run.
`scripts/warm_cache.py` pre-compiles exactly this graph set so a driver
run is compile-free when the persistent cache carries across sessions
(measured ~11 min per full-size scan graph when it does not).

MFU: per-UNet-call FLOPs via client-side `jit(...).lower(...).cost_analysis()`
(no backend compile), scaled to the 2 CFG passes per sampler step, against
the chip's bf16 peak (`unet_mfu_512` / `unet_mfu_1024`). docs/DESIGN.md
"Roofline" attributes the gap.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEPS = 50

# bf16 peak FLOP/s by device_kind prefix (longest match wins).
# v5e ("v5 lite"): 197 TFLOP/s; v5p 459; v4 275; v6e ("v6 lite") 918.
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "") or ""
    best = None
    for prefix, peak in _PEAK_BF16.items():
        if kind.startswith(prefix) and (best is None or len(prefix) > best[0]):
            best = (len(prefix), peak)
    return best[1] if best else None


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
    sizes = [1 if not s.shape else int(functools.reduce(
        lambda a, b: a * b, s.shape)) for s in leaves]

    # ONE jitted generator for the whole pytree: a per-leaf
    # jax.random.normal costs a tunnel round trip + a tiny compile each
    # (~700 leaves for the UNet — measured ~9 MINUTES of bench wall time
    # under the tunneled backend); one flat draw + static slices is a
    # single cheap graph and one dispatch.
    @jax.jit
    def make():
        flat = jax.random.normal(jax.random.PRNGKey(42), (sum(sizes),),
                                 jnp.bfloat16) * 0.02
        out, off = [], 0
        for s, n in zip(leaves, sizes):
            out.append(flat[off:off + n].reshape(s.shape))
            off += n
        return out

    return jax.tree_util.tree_unflatten(treedef, make())


def _repeats(default: int) -> int:
    """BENCH_WARM_ONLY=1 (scripts/warm_cache.py) compiles+executes each
    graph once instead of timing it `default` times."""
    return 1 if os.environ.get("BENCH_WARM_ONLY", "0") == "1" else default


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
                     tokens, img, repeats=_repeats(2))


class ResolutionBench:
    """One resolution's model/conditioning/sampler state, measurable piece
    by piece so main() can emit a JSON milestone between pieces."""

    def __init__(self, mc, b, h, w, steps, dtype, sequential_cfg):
        import jax
        import jax.numpy as jnp

        from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
        from dynamicrafter_tpu.models.vae import Decoder, VAEConfig
        from dynamicrafter_tpu.sampling.ddim import (
            CFGConditioning, SamplerSettings,
        )
        from dynamicrafter_tpu import schedule as sched_lib

        self.mc, self.b, self.h, self.w = mc, b, h, w
        self.steps, self.dtype = steps, dtype
        self.unet_cfg = UNetConfig.from_dict(mc.unet)
        self.vae_cfg = VAEConfig.from_dict(mc.vae)
        self.t_len = self.unet_cfg.temporal_length
        self.unet = UNetModel(self.unet_cfg, dtype=dtype)
        n_img_tok = (mc.resampler or {}).get("num_queries", 16)
        self.n_img_tok = n_img_tok

        # Conditioning is RANDOM and passed as RUNTIME args to the scan (not
        # captured constants): zeros-valued closures are one constant-folding
        # compiler upgrade away from silently benchmarking a hollow model.
        keys = jax.random.split(jax.random.PRNGKey(7), 4)
        zc = self.vae_cfg.z_channels
        self.zc = zc
        t_len = self.t_len
        ctx_dim = self.unet_cfg.context_dim
        self.ctx_dim = ctx_dim
        self.x = jax.random.normal(keys[0], (b, t_len, h, w, zc), dtype)
        self.cond = CFGConditioning(
            context_text=jax.random.normal(
                keys[1], (2, b, 77, ctx_dim), dtype) * 0.1,
            context_img=jax.random.normal(
                keys[2], (2, b, t_len, n_img_tok, ctx_dim), dtype) * 0.1,
            concat=jax.random.normal(
                keys[3], (2, b, t_len, h, w, zc), dtype),
            fs=jnp.full((b,), 24, jnp.int32),
        )
        xfull = jnp.zeros((2 * b, t_len, h, w, 2 * zc), dtype)
        self.uparams = _random_params(
            self.unet, xfull, jnp.zeros((2 * b,), jnp.int32),
            context_text=jnp.zeros((2 * b, 77, ctx_dim), dtype),
            context_img=jnp.zeros((2 * b, t_len, n_img_tok, ctx_dim), dtype),
            fs=jnp.zeros((2 * b,), jnp.int32))

        self.schedule = sched_lib.build_schedule(
            timesteps=mc.timesteps, linear_start=mc.linear_start,
            linear_end=mc.linear_end, parameterization=mc.parameterization,
            rescale_betas_zero_snr=mc.rescale_betas_zero_snr,
            use_dynamic_rescale=mc.use_dynamic_rescale,
            base_scale=mc.base_scale)
        self._sched_lib = sched_lib
        self.settings = SamplerSettings(
            steps=steps, discretize="uniform_trailing", eta=0.0,
            cfg_scale=7.5, guidance_rescale=0.7,
            parameterization=mc.parameterization,
            sequential_cfg=sequential_cfg)
        self._decoder = Decoder(self.vae_cfg, dtype=dtype)
        self._dparams = None

    def unet_apply(self, p, xin, tsin, context_text, context_img, fs, **kw):
        return self.unet.apply(
            {"params": p}, xin, tsin, context_text=context_text,
            context_img=context_img, fs=fs, **kw)

    def measure_scan(self, settings=None, bake=False, repeats=2) -> float:
        """Seconds for the full jitted sampler scan (DDIM or DPM per
        settings.sampler), batched or sequential CFG per settings."""
        import jax.numpy as jnp

        from dynamicrafter_tpu.sampling.ddim import (
            ddim_sample, make_cfg_denoiser,
        )
        from dynamicrafter_tpu.sampling.dpm import dpm_sample
        from dynamicrafter_tpu.sampling.unipc import unipc_sample
        from dynamicrafter_tpu.utils.timing import time_once

        settings = settings or self.settings
        table = self._sched_lib.build_ddim_table(
            self.schedule, num_steps=settings.steps,
            discretize=settings.discretize, eta=settings.eta)
        sample_fn = {"dpm": dpm_sample, "unipc": unipc_sample,
                     "ddim": ddim_sample}[settings.sampler]
        dtype = self.dtype

        # Weights are passed as runtime args (the serving reality: weights
        # live in HBM, one executable serves any checkpoint). Baking them as
        # compile-time constants measured ~9% faster steps in round 1, but
        # with RANDOM weights XLA must lower 2.9 GB of literal data —
        # compile blows up from ~1 min to >30 min — so baking is opt-in
        # (BENCH_BAKE=1).
        if bake:
            uparams = self.uparams

            def full_scan(c, x0):
                model_fn = make_cfg_denoiser(
                    self.unet_apply, uparams, c, settings)
                return sample_fn(model_fn, x0.astype(jnp.float32),
                                 self.schedule, table, settings).astype(dtype)

            return time_once(full_scan, self.cond, self.x,
                             repeats=_repeats(repeats))

        def full_scan(params, c, x0):
            model_fn = make_cfg_denoiser(self.unet_apply, params, c, settings)
            return sample_fn(model_fn, x0.astype(jnp.float32),
                             self.schedule, table, settings).astype(dtype)

        return time_once(full_scan, self.uparams, self.cond, self.x,
                         repeats=_repeats(repeats))

    def measure_decode(self, perframe=True) -> float:
        """Seconds to decode all t_len frames of ONE clip."""
        import jax.numpy as jnp

        from dynamicrafter_tpu.utils.timing import time_once

        if self._dparams is None:
            self._dparams = _random_params(
                self._decoder, jnp.zeros((1, self.h, self.w, self.zc),
                                         self.dtype))

        def decode_1f(params, z):
            return self._decoder.apply({"params": params}, z)

        if perframe:
            # per-frame decode (perframe_ae, reference ddpm3d.py:654-663);
            # one frame timed, multiplied by T (frames are independent)
            return self.t_len * time_once(
                decode_1f, self._dparams,
                jnp.zeros((1, self.h, self.w, self.zc), self.dtype),
                repeats=_repeats(2))
        # batched decode of all T frames in one call (the reference's
        # perframe_ae=False mode, used for its 256x256 baseline)
        return time_once(
            decode_1f, self._dparams,
            jnp.zeros((self.t_len, self.h, self.w, self.zc), self.dtype),
            repeats=_repeats(2))

    def measure_conditioning(self) -> float:
        return _bench_conditioning(self.mc, self.b, self.h, self.w,
                                   self.dtype)

    def unet_flops_per_sampler_step(self) -> float | None:
        """FLOPs of the 2 CFG passes of one sampler step, via the compiled
        executable's cost analysis (`.lower().compile().cost_analysis()` —
        client-side `lower().cost_analysis()` returns None under the axon
        plugin). The compile is one extra graph through the remote
        compiler; scripts/warm_cache.py pre-warms it, making driver runs a
        seconds-cheap persistent-cache replay."""
        import jax
        import jax.numpy as jnp

        b, t_len, h, w = self.b, self.t_len, self.h, self.w
        if self.settings.sequential_cfg:
            n_calls, bb = 2, b          # 2 UNet calls at batch b per step
        else:
            n_calls, bb = 1, 2 * b      # 1 call at batch 2b per step
        args = (
            self.uparams,
            jnp.zeros((bb, t_len, h, w, 2 * self.zc), self.dtype),
            jnp.zeros((bb,), jnp.int32),
            jnp.zeros((bb, 77, self.ctx_dim), self.dtype),
            jnp.zeros((bb, t_len, self.n_img_tok, self.ctx_dim), self.dtype),
            jnp.zeros((bb,), jnp.int32),
        )
        try:
            compiled = jax.jit(self.unet_apply).lower(*args).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float((ca or {}).get("flops", 0.0))
        except Exception as e:  # cost analysis is best-effort telemetry
            print(f"# flops estimate unavailable: {e}", file=sys.stderr)
            return None
        return n_calls * flops if flops > 0 else None


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

    t_start = time.time()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2700"))
    if os.environ.get("BENCH_WARM_ONLY", "0") == "1":
        budget_s = float("inf")

    on_tpu = jax.default_backend() == "tpu"
    import jax.numpy as jnp
    dtype = jnp.bfloat16
    here = os.path.dirname(os.path.abspath(__file__))

    detail: dict = {"backend": jax.default_backend()}
    skipped: list = []
    state = {"metric": None, "value": None, "unit": "clips/min/chip",
             "vs_baseline": None}

    def emit():
        # one full-result line per milestone; the driver takes the LAST
        # JSON line on stdout, so a timeout mid-run still leaves the
        # richest-so-far result (round-4 rc=124 lesson)
        d = dict(detail)
        if skipped:
            d["skipped"] = list(skipped)
        d["bench_wall_s"] = round(time.time() - t_start, 1)
        print(json.dumps({
            "metric": state["metric"], "value": state["value"],
            "unit": state["unit"], "vs_baseline": state["vs_baseline"],
            "detail": d,
        }), flush=True)

    def over_budget(est_s: float, row: str) -> bool:
        remaining = budget_s - (time.time() - t_start)
        if est_s > remaining:
            skipped.append(f"{row} (est {est_s:.0f}s > {remaining:.0f}s "
                           "left of BENCH_BUDGET_S)")
            print(f"# skipping {row}: est {est_s:.0f}s exceeds remaining "
                  f"budget {remaining:.0f}s", file=sys.stderr)
            return True
        return False

    if not on_tpu:
        from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG

        mc = ModelConfig(TINY_MODEL_CONFIG)
        rb = ResolutionBench(mc, 1, 8, 8, 4, dtype, sequential_cfg=False)
        scan_s = rb.measure_scan()
        decode_s = rb.measure_decode()
        detail.update({
            "batch": 1, "ddim_cfg_scan_s": round(scan_s, 3),
            "vae_decode_s": round(decode_s, 3),
            "e2e_clip_s": round(scan_s + decode_s, 2),
        })
        state["metric"] = "clips_per_min_per_chip_320x512_CPU_FALLBACK"
        state["value"] = round(60.0 / (scan_s + decode_s), 3)
        state["vs_baseline"] = round(state["value"] / 3.0, 3)
        emit()
        return

    # Fidelity-gate visibility first (cheap): the PSNR>40 check needs
    # released weights; if they are mounted we say where, else ONE
    # actionable line on stderr.
    from dynamicrafter_tpu.utils.discovery import discover

    found, blocked = discover("512")
    detail["fidelity_gate"] = (found["checkpoint"] or "blocked")
    if blocked:
        print(blocked, file=sys.stderr)

    peak = _peak_flops(jax.devices()[0])
    detail["device_kind"] = jax.devices()[0].device_kind

    # ---- 320x512 exact (the headline) -----------------------------------
    mc512 = ModelConfig.from_yaml(
        os.path.join(here, "configs", "inference_512_v1.0.yaml"))
    rb512 = ResolutionBench(mc512, 1, 40, 64, STEPS, dtype,
                            sequential_cfg=False)
    t_blk = time.time()
    scan512_s = rb512.measure_scan()
    # wall minus the 3 executions (compile call + 2 timed) ~= this
    # process's compile cost for a full-size scan graph; ~0 on cache hit.
    # Scales the optional-row estimates below so a cold run sheds work.
    compile512_s = max(0.0, time.time() - t_blk - 3 * scan512_s)
    decode512_s = rb512.measure_decode()
    cond512_s = rb512.measure_conditioning()
    e2e512_s = cond512_s + scan512_s + decode512_s
    detail.update({
        "batch": 1,
        "cond_stage_s": round(cond512_s, 3),
        "ddim50_cfg_scan_s": round(scan512_s, 3),
        "unet_step_ms": round(scan512_s / STEPS * 1000, 1),
        "vae_decode_16f_s": round(decode512_s, 3),
        "e2e_clip_s": round(e2e512_s, 2),
        "weights_baked": False,
        "sequential_cfg": False,
    })
    state["metric"] = "clips_per_min_per_chip_320x512"
    state["value"] = round(60.0 / e2e512_s, 3)
    state["vs_baseline"] = round(state["value"] / 3.0, 3)  # A100: 20 s/clip
    emit()  # headline on stdout before anything slow can time out

    # ---- 576x1024 exact --------------------------------------------------
    if os.environ.get("BENCH_SKIP_1024", "0") != "1":
        mc1024 = ModelConfig.from_yaml(
            os.path.join(here, "configs", "inference_1024_v1.0.yaml"))
        rb1024 = ResolutionBench(mc1024, 1, 72, 128, STEPS, dtype,
                                 sequential_cfg=True)
        t_blk = time.time()
        scan1024_s = rb1024.measure_scan(repeats=1)
        compile1024_s = max(0.0, time.time() - t_blk - 2 * scan1024_s)
        decode1024_s = rb1024.measure_decode()
        cond1024_s = rb1024.measure_conditioning()
        e2e1024_s = cond1024_s + scan1024_s + decode1024_s
        detail.update({
            "clip_1024_s": round(e2e1024_s, 2),
            "cond_stage_1024_s": round(cond1024_s, 3),
            "unet_step_1024_ms": round(scan1024_s / STEPS * 1000, 1),
            "sequential_cfg_1024": True,
            "vae_decode_1024_16f_s": round(decode1024_s, 3),
            # A100 reference: 75 s/clip at 576x1024 (README.md:292-294)
            "vs_baseline_1024": round(75.0 / e2e1024_s, 3),
        })
        emit()

    # ---- MFU rows (after the required exact rows: each is one extra
    # UNet-call graph — a seconds-cheap cache replay when warmed, a
    # multi-minute remote compile when cold, hence budget-gated) ----------
    # single-call graph is strictly smaller than its scan graph, so its
    # cold-compile cost is bounded by the measured scan compile cost
    if peak and not over_budget(30 + 0.8 * compile512_s, "unet_mfu_512"):
        flops512 = rb512.unet_flops_per_sampler_step()
        if flops512:
            detail["unet_flops_per_step_512"] = flops512
            detail["unet_mfu_512"] = round(
                flops512 / (scan512_s / STEPS) / peak, 4)
            emit()
    if peak and os.environ.get("BENCH_SKIP_1024", "0") != "1" \
            and not over_budget(60 + 0.8 * compile1024_s, "unet_mfu_1024"):
        flops1024 = rb1024.unet_flops_per_sampler_step()
        if flops1024:
            detail["unet_flops_per_step_1024"] = flops1024
            detail["unet_mfu_1024"] = round(
                flops1024 / (scan1024_s / STEPS) / peak, 4)
            emit()

    # ---- optional rows, budget-gated -------------------------------------
    import dataclasses

    # DeepCache accelerated sampling at 512: separate detail keys, never
    # the headline (approximation — different outputs from the exact
    # sampler). Default N=5 is the CERTIFIED serving interval: >=90 dB
    # latent / >=68 dB pixel PSNR vs exact at full-size 256/512, both CFG
    # modes, RANDOM-weight architecture proxy (PARITY_RESULTS.md "DeepCache
    # quality"; scripts/deepcache_certify.py). BENCH_DEEPCACHE=0 disables,
    # =N overrides.
    dc = int(os.environ.get("BENCH_DEEPCACHE", "5"))
    if dc > 1 and STEPS % dc == 0 \
            and not over_budget(2.2 * 0.7 * scan512_s + compile512_s,
                                "deepcache_512"):
        dc_settings = dataclasses.replace(rb512.settings, deepcache=dc)
        dc_s = rb512.measure_scan(settings=dc_settings)
        detail[f"ddim50_deepcache{dc}_scan_s"] = round(dc_s, 3)
        detail[f"e2e_clip_s_deepcache{dc}"] = round(
            cond512_s + dc_s + decode512_s, 2)
        emit()

    # DPM-Solver++(2M) fast mode at 512: exact-model sampling at a lower
    # step count (DDIM-50-class discretization error at ~30 steps,
    # tests/test_dpm.py + scripts/dpm_certify.py). Detail rows only.
    # BENCH_DPM=0 disables, =N overrides the step count.
    dpm_steps = int(os.environ.get("BENCH_DPM", "30"))
    if dpm_steps > 1 and not over_budget(
            2.2 * (dpm_steps / STEPS) * scan512_s + compile512_s,
            "dpm_512"):
        dpm_settings = dataclasses.replace(
            rb512.settings, steps=dpm_steps, eta=0.0, sampler="dpm")
        dpm_s = rb512.measure_scan(settings=dpm_settings)
        detail[f"dpm{dpm_steps}_cfg_scan_s"] = round(dpm_s, 3)
        detail[f"e2e_clip_s_dpm{dpm_steps}"] = round(
            cond512_s + dpm_s + decode512_s, 2)
        emit()

    # UniPC low-NFE mode at 512 (opt-in): BENCH_UNIPC=N runs the
    # predictor-corrector at N steps (sampling/unipc.py; quality rows in
    # PARITY_RESULTS.md — a speed/quality trade, not DDIM-50-class).
    unipc_steps = int(os.environ.get("BENCH_UNIPC", "0"))
    if unipc_steps > 1 and not over_budget(
            2.2 * (unipc_steps / STEPS) * scan512_s + compile512_s,
            "unipc_512"):
        up_settings = dataclasses.replace(
            rb512.settings, steps=unipc_steps, eta=0.0, sampler="unipc")
        up_s = rb512.measure_scan(settings=up_settings)
        detail[f"unipc{unipc_steps}_cfg_scan_s"] = round(up_s, 3)
        detail[f"e2e_clip_s_unipc{unipc_steps}"] = round(
            cond512_s + up_s + decode512_s, 2)
        emit()

    # Certified 1024 fast mode (default row): dpm@40 is the quality-
    # certified DDIM-50-class setting at 576x1024 (PARITY_RESULTS.md —
    # dpm@30 only reaches ddim@30-class there). Budget-guarded like every
    # optional row, so a cold compile cache skips it instead of costing
    # the driver its run. BENCH_DPM_1024=0 disables, =N overrides.
    dpm1024_steps = int(os.environ.get("BENCH_DPM_1024", "40"))
    if dpm1024_steps > 1 \
            and os.environ.get("BENCH_SKIP_1024", "0") != "1" \
            and not over_budget(
                2.2 * (dpm1024_steps / STEPS) * scan1024_s + compile1024_s,
                "dpm_1024_certified"):
        dps = dataclasses.replace(
            rb1024.settings, steps=dpm1024_steps, eta=0.0, sampler="dpm")
        dpm1024_s = rb1024.measure_scan(settings=dps, repeats=1)
        detail[f"dpm{dpm1024_steps}_cfg_scan_s_1024"] = round(dpm1024_s, 3)
        detail[f"e2e_clip_s_dpm{dpm1024_steps}_1024"] = round(
            cond1024_s + dpm1024_s + decode1024_s, 2)
        emit()

    # 1024 extras are opt-in: round 4 made them default and the combined
    # device time alone (~4.5 min on top of ~7) blew the driver's timeout.
    if os.environ.get("BENCH_1024_EXTRAS", "0") == "1" \
            and os.environ.get("BENCH_SKIP_1024", "0") != "1":
        alt = dataclasses.replace(rb1024.settings, sequential_cfg=False)
        if not over_budget(2.2 * scan1024_s + compile1024_s, "altcfg_1024"):
            alt_s = rb1024.measure_scan(settings=alt, repeats=1)
            detail["ddim50_cfg_scan_1024_alt_s"] = round(alt_s, 3)
            detail["sequential_cfg_1024"] = alt_s >= scan1024_s
            emit()
        if dc > 1 and STEPS % dc == 0 \
                and not over_budget(2.2 * 0.7 * scan1024_s + compile1024_s,
                                    "deepcache_1024"):
            dcs = dataclasses.replace(rb1024.settings, deepcache=dc)
            dc1024_s = rb1024.measure_scan(settings=dcs, repeats=1)
            detail[f"ddim50_deepcache{dc}_scan_s_1024"] = round(dc1024_s, 3)
            detail[f"e2e_clip_s_deepcache{dc}_1024"] = round(
                cond1024_s + dc1024_s + decode1024_s, 2)
            emit()
        if dpm_steps > 1 and not over_budget(
                2.2 * (dpm_steps / STEPS) * scan1024_s + compile1024_s,
                "dpm_1024"):
            dps = dataclasses.replace(
                rb1024.settings, steps=dpm_steps, eta=0.0, sampler="dpm")
            dpm1024_s = rb1024.measure_scan(settings=dps, repeats=1)
            detail[f"dpm{dpm_steps}_cfg_scan_s_1024"] = round(dpm1024_s, 3)
            detail[f"e2e_clip_s_dpm{dpm_steps}_1024"] = round(
                cond1024_s + dpm1024_s + decode1024_s, 2)
            emit()
    elif os.environ.get("BENCH_SKIP_1024", "0") != "1":
        skipped.append("1024 deepcache/alt-cfg (+BENCH_DPM-step dpm) rows "
                       "(opt-in: BENCH_1024_EXTRAS=1)")

    # opt-in: the reference's third headline row — 256x256, DDIM-50,
    # perframe_ae=False i.e. batched decode, 10 s/clip on A100
    # (README.md:296)
    if os.environ.get("BENCH_256", "0") == "1":
        mc256 = ModelConfig.from_yaml(
            os.path.join(here, "configs", "inference_256_v1.0.yaml"))
        rb256 = ResolutionBench(mc256, 1, 32, 32, STEPS, dtype,
                                sequential_cfg=False)
        s256 = rb256.measure_scan()
        d256 = rb256.measure_decode(perframe=False)
        c256 = rb256.measure_conditioning()
        detail["clip_256_s"] = round(c256 + s256 + d256, 2)
        detail["unet_step_256_ms"] = round(s256 / STEPS * 1000, 1)
        detail["vs_baseline_256"] = round(10.0 / detail["clip_256_s"], 3)
        emit()

    # opt-in: throughput-optimized serving at 320x512 — b clips per
    # batched-CFG scan (UNet batch 2b) amortizes the per-step weight reads;
    # per-clip e2e = total / b
    bb = int(os.environ.get("BENCH_BATCH", "0"))
    if bb > 1:
        rbb = ResolutionBench(mc512, bb, 40, 64, STEPS, dtype,
                              sequential_cfg=False)
        sb = rbb.measure_scan()
        db = rbb.measure_decode()
        cb = rbb.measure_conditioning()
        per_clip = (cb + sb + bb * db) / bb
        detail[f"clip_512_s_b{bb}"] = round(per_clip, 2)
        detail[f"clips_per_min_b{bb}"] = round(60.0 / per_clip, 3)
        emit()

    # opt-in: weights baked as compile-time constants (~9% faster steps,
    # 30+ min compile with random weights — docs/DESIGN.md "Weight baking")
    if os.environ.get("BENCH_BAKE", "0") == "1":
        baked_s = rb512.measure_scan(bake=True)
        detail["ddim50_cfg_scan_baked_s"] = round(baked_s, 3)
        emit()

    emit()  # final line (also covers the all-rows-skipped case)


if __name__ == "__main__":
    main()
