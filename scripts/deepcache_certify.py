"""DeepCache quality certification: PSNR/SSIM of deepcache=N vs the exact
sampler (deepcache=1), full-size 256 and 512 configs, N=2..5, both CFG modes.

DeepCache (Ma et al., CVPR'24) reuses the UNet's deep-feature cache across
adjacent DDIM steps; it is an opt-in approximation with no reference
counterpart, so the quality bar is OURS to certify: for each interval N we
sample with identical noise/conditioning under deepcache=N and deepcache=1
and report final-latent PSNR plus decoded-pixel PSNR/SSIM through a shared
decoder.  The round-3 verdict asked for exactly this table — until it
existed, the honest 1024 headline had to stay the exact sampler's.

Caveats (stated in PARITY_RESULTS.md alongside the table):
  * random bf16 weights (no released checkpoint mounted in this sandbox) —
    identical FLOPs/memory, but the quality transfer to trained weights is
    unproven in both directions: trained nets have smoother deep features
    across adjacent timesteps (favors trained), while the 0.02-scale random
    init attenuates deep-path contributions relative to the skip paths
    (favors random). Re-run this script the moment released weights mount
    (utils/discovery.py finds them) for the binding numbers;
  * N must divide the step count (sampling/ddim.py:273), so N in {3,4} is
    certified at 48 steps against a 48-step exact baseline (N in {2,5} at
    the shipped 50).

Run on the real TPU chip (plain `python scripts/deepcache_certify.py`);
writes one JSON line per (resolution, cfg_mode, N) and, with --out, a
markdown table appended to PARITY_RESULTS.md.

Compile economics (why --intervals defaults to just 5): every distinct
(resolution, cfg passes, N) is its own XLA module, and the tunneled remote
compiler takes ~10+ min per full-size module (docs/DESIGN.md "Measured").
N=5 is the advertised serving flag, so it is certified first; re-runs with
more intervals reuse the exact-baseline executables through the persistent
compile cache and only pay for the new-N modules.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def _enable_compile_cache():
    """Persistent compile cache — must be set via jax.config (the axon
    sitecustomize plugin imports jax before env vars set here would bind;
    see __graft_entry__.py). Cuts the ~10 min/module tunneled remote
    compile to a local load on every re-run."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_dctpu_tests"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    rng = float(b.max() - b.min())
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(rng ** 2 / mse)


def _ssim(a: np.ndarray, b: np.ndarray, win: int = 8) -> float:
    """Mean SSIM over frames with a uniform win x win window (standard
    K1/K2, data_range from the exact output). Inputs (..., H, W, C)."""
    a = a.astype(np.float64).reshape((-1,) + a.shape[-3:])
    b = b.astype(np.float64).reshape((-1,) + b.shape[-3:])
    L = float(b.max() - b.min())
    c1, c2 = (0.01 * L) ** 2, (0.03 * L) ** 2

    def box(x):  # (N, H, W, C) -> windowed means via cumsum integral image
        for axis in (1, 2):
            c = np.cumsum(x, axis=axis)
            lead = np.take(c, range(win - 1, x.shape[axis]), axis=axis)
            lag = np.concatenate(
                [np.zeros_like(np.take(c, [0], axis=axis)),
                 np.take(c, range(0, x.shape[axis] - win), axis=axis)],
                axis=axis)
            x = (lead - lag) / win
        return x

    mu_a, mu_b = box(a), box(b)
    var_a = box(a * a) - mu_a ** 2
    var_b = box(b * b) - mu_b ** 2
    cov = box(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2) /
         ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)))
    return float(s.mean())


def _load_real_params(res: str):
    """(unet_params, decoder_params) from an auto-discovered released
    checkpoint, or None when none is mounted. Params stay fp32 (a superset
    of serving's fp32-island rule); compute is bf16 either way, and both
    the exact and deepcache samples share the same params, so the
    comparison is apples-to-apples regardless."""
    from dynamicrafter_tpu.utils import weights as W
    from dynamicrafter_tpu.utils.discovery import find_checkpoint

    path = find_checkpoint(res)
    if path is None:
        return None
    from dynamicrafter_tpu.utils.torch_reader import load_torch_checkpoint

    sd = W.normalize_state_dict(load_torch_checkpoint(path))
    sd = {k: np.asarray(v) for k, v in sd.items()}
    split = W.split_reference_checkpoint(sd)
    print(f"# using released weights: {path}", flush=True)
    return W.convert_unet(split["unet"]), W.convert_vae(split["vae"])["decoder"]


def run_config(mc, h, w, steps, n_list, passes, dtype, real=None):
    """Returns rows: one dict per N (N=1 is the exact baseline, not a row)."""
    import jax
    import jax.numpy as jnp

    from dynamicrafter_tpu import schedule as sched_lib
    from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
    from dynamicrafter_tpu.models.vae import Decoder, VAEConfig
    from dynamicrafter_tpu.sampling.ddim import (
        CFGConditioning, SamplerSettings, ddim_sample, make_cfg_denoiser,
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
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
        uparams = real[0]
    else:
        xfull = jnp.zeros((passes * b, t_len, h, w, 2 * zc), dtype)
        uparams = _random_params(
            unet, xfull, jnp.zeros((passes * b,), jnp.int32),
            context_text=jnp.zeros((passes * b, 77, ctx_dim), dtype),
            context_img=jnp.zeros((passes * b, t_len, n_img_tok, ctx_dim),
                                  dtype),
            fs=jnp.zeros((passes * b,), jnp.int32))

    schedule = sched_lib.build_schedule(
        timesteps=mc.timesteps, linear_start=mc.linear_start,
        linear_end=mc.linear_end, parameterization=mc.parameterization,
        rescale_betas_zero_snr=mc.rescale_betas_zero_snr,
        use_dynamic_rescale=mc.use_dynamic_rescale, base_scale=mc.base_scale)

    decoder = Decoder(vae_cfg, dtype=dtype)
    if real is not None:
        dparams = real[1]
    else:
        dparams = _random_params(decoder, jnp.zeros((1, h, w, zc), dtype))

    @jax.jit
    def decode(z):  # (T, h, w, zc) -> (T, H, W, 3) fp32, per-frame semantics
        return decoder.apply({"params": dparams}, z).astype(jnp.float32)

    def unet_apply(p, xin, tsin, context_text, context_img, fs, **kw):
        return unet.apply({"params": p}, xin, tsin, context_text=context_text,
                          context_img=context_img, fs=fs, **kw)

    def sample(n_steps, dc):
        table = sched_lib.build_ddim_table(
            schedule, num_steps=n_steps, discretize="uniform_trailing",
            eta=0.0)
        settings = SamplerSettings(
            steps=n_steps, discretize="uniform_trailing", eta=0.0,
            cfg_scale=7.5, cfg_img=1.5 if passes == 3 else None,
            guidance_rescale=0.7, parameterization=mc.parameterization,
            deepcache=dc)

        @jax.jit
        def run(params, c, x0):
            model_fn = make_cfg_denoiser(unet_apply, params, c, settings)
            return ddim_sample(model_fn, x0.astype(jnp.float32), schedule,
                               table, settings)

        z = run(uparams, cond, x_T)
        return np.asarray(z, np.float32), np.asarray(decode(z[0]))

    exact = {}  # step count -> (latent, pixels)
    rows = []
    for n in n_list:
        n_steps = steps if steps % n == 0 else (steps // n) * n
        if n_steps not in exact:
            print(f"# exact baseline steps={n_steps} (compiling...)",
                  flush=True)
            t0 = time.time()
            exact[n_steps] = sample(n_steps, 1)
            print(f"# exact baseline done in {time.time() - t0:.0f}s",
                  flush=True)
        t0 = time.time()
        z, px = sample(n_steps, n)
        z_ref, px_ref = exact[n_steps]
        rows.append({
            "interval_N": n,
            "steps": n_steps,
            "cfg_passes": passes,
            "latent_psnr_db": round(_psnr(z, z_ref), 2),
            "pixel_psnr_db": round(_psnr(px, px_ref), 2),
            "pixel_ssim": round(_ssim(px, px_ref), 4),
            "seconds": round(time.time() - t0, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolutions", default="256,512")
    p.add_argument("--intervals", default="5",
                   help="comma list; each N is a separate ~10 min remote "
                        "compile, so the advertised serving interval (5) "
                        "is the default — extend on re-runs (baselines "
                        "come back from the compile cache)")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--cfg_passes", default="2,3")
    p.add_argument("--out", default=None,
                   help="append a markdown table to this file")
    args = p.parse_args()

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dynamicrafter_tpu.config import ModelConfig

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    shapes = {"256": (32, 32), "512": (40, 64)}
    n_list = [int(n) for n in args.intervals.split(",")]
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
            rows = run_config(mc, h, w, args.steps, n_list, passes,
                              jnp.bfloat16, real=real)
            for r in rows:
                r["resolution"] = res
                r["weights"] = "released" if real is not None else "random"
            all_rows.extend(rows)

    if args.out:
        wkinds = sorted({r["weights"] for r in all_rows})
        with open(args.out, "a") as f:
            f.write("\n## DeepCache quality vs exact sampler "
                    f"({'/'.join(wkinds)} bf16 weights, "
                    f"{jax.default_backend()})\n\n")
            f.write("| res | CFG | N | steps | latent PSNR dB | "
                    "pixel PSNR dB | pixel SSIM |\n|---|---|---|---|---|"
                    "---|---|\n")
            for r in all_rows:
                f.write(f"| {r['resolution']} | {r['cfg_passes']}-pass | "
                        f"{r['interval_N']} | {r['steps']} | "
                        f"{r['latent_psnr_db']} | {r['pixel_psnr_db']} | "
                        f"{r['pixel_ssim']} |\n")
        print(f"appended table to {args.out}")


if __name__ == "__main__":
    main()
