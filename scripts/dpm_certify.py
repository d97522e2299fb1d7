"""DPM-Solver++(2M) quality certification at full model size.

tests/test_dpm.py establishes the solver's convergence order on an analytic
oracle and its equal-trajectory property on a tiny UNet; this script runs
the FULL-SIZE 256/512 configs on the real chip and quantifies the serving
claim ("DPM-30 is DDIM-50-class") the same way scripts/deepcache_certify.py
certifies DeepCache: identical noise/conditioning, a fine-step reference
trajectory, latent PSNR + relative L2 + decoded-pixel PSNR through a shared
decoder.

Reference trajectory: DPM++(2M) at --ref_steps (default 120). Its
discretization error is O(1/S^2) — at 120 steps it sits far below every
candidate (DDIM-50's O(1/50) dominates all gaps measured here), and the
tiny-UNet regression in tests/test_dpm.py pins that DDIM converges to the
SAME trajectory, so the fine solver choice does not bias the comparison.

Candidates (default): dpm@30, ddim@50, ddim@30. The claim certifies when
err(dpm@30) <= err(ddim@50); err(ddim@30) shows what 30 steps costs the
first-order solver at the same budget.

Caveats shared with the DeepCache certifier: random bf16 weights unless a
released checkpoint is mounted (utils/discovery.py auto-finds one; re-run
then for binding numbers). Compile economics: each (resolution, sampler,
steps) is its own XLA module through the ~5-10 min tunneled remote
compiler; the persistent compile cache makes re-runs free.

Run: `python scripts/dpm_certify.py` (real chip; --resolutions 256 first
for a fast signal). Writes one JSON line per candidate and, with --out, a
markdown table appended (PARITY_RESULTS.md "DPM-Solver++ quality").
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from deepcache_certify import (  # noqa: E402
    _enable_compile_cache, _load_real_params, _psnr,
)


def run_config(mc, h, w, candidates, ref_steps, passes, dtype, real=None,
               sequential_cfg=False):
    """Sample each (sampler, steps) candidate from identical noise/cond and
    score against the fine-step reference. Returns one row per candidate."""
    import jax
    import jax.numpy as jnp

    from dynamicrafter_tpu import schedule as sched_lib
    from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
    from dynamicrafter_tpu.models.vae import Decoder, VAEConfig
    from dynamicrafter_tpu.sampling.ddim import (
        CFGConditioning, SamplerSettings, ddim_sample, make_cfg_denoiser,
    )
    from dynamicrafter_tpu.sampling.dpm import dpm_sample
    from dynamicrafter_tpu.sampling.unipc import unipc_sample

    from bench import _random_params  # noqa: E402  (same random-weight build)

    unet_cfg = UNetConfig.from_dict(mc.unet)
    vae_cfg = VAEConfig.from_dict(mc.vae)
    t_len = unet_cfg.temporal_length
    unet = UNetModel(unet_cfg, dtype=dtype)
    n_img_tok = (mc.resampler or {}).get("num_queries", 16)
    ctx_dim = unet_cfg.context_dim
    zc = vae_cfg.z_channels
    b = 1

    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    x_T = jax.random.normal(keys[0], (b, t_len, h, w, zc), dtype)
    cond = CFGConditioning(
        context_text=jax.random.normal(
            keys[1], (passes, b, 77, ctx_dim), dtype) * 0.1,
        context_img=jax.random.normal(
            keys[2], (passes, b, t_len, n_img_tok, ctx_dim), dtype) * 0.1,
        concat=jax.random.normal(keys[3], (passes, b, t_len, h, w, zc),
                                 dtype),
        fs=jnp.full((b,), 24, jnp.int32))
    if real is not None:
        uparams, dparams = real
    else:
        xfull = jnp.zeros((passes * b, t_len, h, w, 2 * zc), dtype)
        uparams = _random_params(
            unet, xfull, jnp.zeros((passes * b,), jnp.int32),
            context_text=jnp.zeros((passes * b, 77, ctx_dim), dtype),
            context_img=jnp.zeros((passes * b, t_len, n_img_tok, ctx_dim),
                                  dtype),
            fs=jnp.zeros((passes * b,), jnp.int32))
        dparams = None

    schedule = sched_lib.build_schedule(
        timesteps=mc.timesteps, linear_start=mc.linear_start,
        linear_end=mc.linear_end, parameterization=mc.parameterization,
        rescale_betas_zero_snr=mc.rescale_betas_zero_snr,
        use_dynamic_rescale=mc.use_dynamic_rescale, base_scale=mc.base_scale)

    decoder = Decoder(vae_cfg, dtype=dtype)
    if dparams is None:
        dparams = _random_params(decoder, jnp.zeros((1, h, w, zc), dtype))

    @jax.jit
    def decode(z):  # (T, h, w, zc) -> (T, H, W, 3) fp32
        # per-frame decode (reference perframe_ae, ddpm3d.py:654-663): at
        # 576x1024 decoding all 16 frames in one call exceeds device memory
        # and crashes the TPU worker (observed; per-frame is how every
        # serving path decodes 1024 too)
        return jax.lax.map(
            lambda zf: decoder.apply({"params": dparams}, zf[None])[0],
            z).astype(jnp.float32)

    def unet_apply(p, xin, tsin, context_text, context_img, fs, **kw):
        return unet.apply({"params": p}, xin, tsin, context_text=context_text,
                          context_img=context_img, fs=fs, **kw)

    def _mk(sampler, n_steps):
        """One shared settings/table builder — the dpm (chunked) and
        ddim/unipc paths must never drift apart on the CFG/schedule knobs
        or every published quality comparison silently corrupts."""
        table = sched_lib.build_ddim_table(
            schedule, num_steps=n_steps, discretize="uniform_trailing",
            eta=0.0)
        settings = SamplerSettings(
            steps=n_steps, discretize="uniform_trailing", eta=0.0,
            cfg_scale=7.5, cfg_img=1.5 if passes == 3 else None,
            guidance_rescale=0.7, parameterization=mc.parameterization,
            sampler=sampler, sequential_cfg=sequential_cfg)
        return table, settings

    # ONE jitted chunk function for every dpm dispatch: the coefficients
    # are arguments, so the dpm@ref reference and a dpm candidate at the
    # same chunk shape literally share this executable — which is what
    # makes a candidate at ref_steps reproduce the reference bit-exactly
    # (and saves a redundant pass through the remote compiler).
    _chunk_table, _chunk_settings = _mk("dpm", ref_steps)

    @jax.jit
    def run_chunk(params, c, x, p_prev, ch):
        model_fn = make_cfg_denoiser(unet_apply, params, c, _chunk_settings)
        return dpm_sample(model_fn, x, schedule, _chunk_table,
                          _chunk_settings, coeffs=ch, carry_in=p_prev,
                          return_carry=True)

    def sample(sampler, n_steps):
        if sampler == "dpm":
            return sample_dpm_chunked(n_steps)
        table, settings = _mk(sampler, n_steps)
        fn = {"ddim": ddim_sample, "unipc": unipc_sample}[sampler]

        @jax.jit
        def run(params, c, x0):
            model_fn = make_cfg_denoiser(unet_apply, params, c, settings)
            return fn(model_fn, x0.astype(jnp.float32), schedule, table,
                      settings)

        z = run(uparams, cond, x_T)
        return np.asarray(z, np.float32), np.asarray(decode(z[0]))

    def sample_dpm_chunked(n_steps, chunk=30):
        """dpm@n_steps dispatched as <=chunk-step scan programs through the
        shared run_chunk executable.

        Bit-exact vs the single-scan path for this maskless setup (the
        carry (x, p_prev) is the only cross-step state; dpm_sample
        docstring). Needed because a single 120-step 576x1024 program
        reproducibly crashes the tunneled TPU worker while 30-step
        programs run fine.
        """
        from dynamicrafter_tpu.sampling.dpm import dpm_solver_pp_2m_coeffs

        while n_steps % chunk:
            chunk -= 1
        table, _ = _mk("dpm", n_steps)
        per = dpm_solver_pp_2m_coeffs(table)

        x = x_T.astype(jnp.float32)
        p = jnp.zeros_like(x)
        for k in range(n_steps // chunk):
            ch = jax.tree_util.tree_map(
                lambda a: a[k * chunk:(k + 1) * chunk], per)
            x, p = run_chunk(uparams, cond, x, p, ch)
        return np.asarray(x, np.float32), np.asarray(decode(x[0]))

    print(f"# reference dpm@{ref_steps} (compiling...)", flush=True)
    t0 = time.time()
    z_ref, px_ref = sample("dpm", ref_steps)
    print(f"# reference done in {time.time() - t0:.0f}s", flush=True)
    ref_norm = float(np.linalg.norm(z_ref))

    def _finite_psnr(a, b):
        # exact match (e.g. a candidate at ref_steps) gives inf, which
        # json.dumps renders as the non-standard 'Infinity' token; emit
        # None instead so the JSON-lines output stays strictly parseable
        v = _psnr(a, b)
        return round(v, 2) if np.isfinite(v) else None

    rows = []
    for sampler, n_steps in candidates:
        t0 = time.time()
        z, px = sample(sampler, n_steps)
        rows.append({
            "sampler": sampler,
            "steps": n_steps,
            "cfg_passes": passes,
            "rel_l2_vs_ref": round(
                float(np.linalg.norm(z - z_ref)) / ref_norm, 5),
            "latent_psnr_db": _finite_psnr(z, z_ref),
            "pixel_psnr_db": _finite_psnr(px, px_ref),
            "seconds": round(time.time() - t0, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolutions", default="256,512")
    p.add_argument("--candidates", default="dpm:30,ddim:50,ddim:30",
                   help="comma list of sampler:steps; each is its own "
                        "~5-10 min remote compile on first run")
    p.add_argument("--ref_steps", type=int, default=120)
    p.add_argument("--cfg_passes", default="2")
    p.add_argument("--out", default=None,
                   help="append a markdown table to this file")
    args = p.parse_args()

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dynamicrafter_tpu.config import ModelConfig

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    shapes = {"256": (32, 32), "512": (40, 64), "1024": (72, 128)}
    candidates = [(s.split(":")[0], int(s.split(":")[1]))
                  for s in args.candidates.split(",")]
    all_rows = []
    for res in args.resolutions.split(","):
        mc = ModelConfig.from_yaml(
            os.path.join(here, "configs", f"inference_{res}_v1.0.yaml"))
        h, w = shapes[res]
        real = _load_real_params(res)
        if real is None:
            print(f"# resolution {res}: no released checkpoint mounted — "
                  "random bf16 weights (utils/discovery.py lists the "
                  "search paths)", flush=True)
        for passes in [int(x) for x in args.cfg_passes.split(",")]:
            print(f"# resolution {res}, {passes}-pass CFG", flush=True)
            # 1024 single-chip runs CFG passes serially (the serving-mode
            # memory fallback, scripts/inference.py:175) — same trajectory,
            # halved peak activation memory
            rows = run_config(mc, h, w, candidates, args.ref_steps, passes,
                              jnp.bfloat16, real=real,
                              sequential_cfg=(res == "1024"))
            for r in rows:
                r["resolution"] = res
                r["weights"] = "released" if real is not None else "random"
            all_rows.extend(rows)

    if args.out:
        wkinds = sorted({r["weights"] for r in all_rows})
        with open(args.out, "a") as f:
            f.write("\n## DPM-Solver++ quality vs fine-step trajectory "
                    f"(ref dpm@{args.ref_steps}; {'/'.join(wkinds)} bf16 "
                    f"weights, {jax.default_backend()})\n\n")
            f.write("| res | CFG | sampler | steps | rel L2 vs ref | "
                    "latent PSNR dB | pixel PSNR dB |\n"
                    "|---|---|---|---|---|---|---|\n")
            for r in all_rows:
                f.write(f"| {r['resolution']} | {r['cfg_passes']}-pass | "
                        f"{r['sampler']} | {r['steps']} | "
                        f"{r['rel_l2_vs_ref']} | {r['latent_psnr_db']} | "
                        f"{r['pixel_psnr_db']} |\n")
        print(f"appended table to {args.out}")


if __name__ == "__main__":
    main()
