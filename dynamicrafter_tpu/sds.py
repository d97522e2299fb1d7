"""Score-Distillation-Sampling (SDS) guidance pipeline.

Behavioral parity target: the fork's DynamiCrafterGuidancePipeline
(guidance_pipeline.py:34, _sds_loss 347-424, _optimization_loop 759-808):
replace the DDIM loop with Adam optimization of the latent against the
score-distillation gradient

    grad = w(t) * (z - x0_hat),   x0_hat = (z_t - sqrt(1-a_t) eps) / sqrt(a_t)

with timesteps drawn from the 50-step DDIM grid (middle 2%..98%), 2-pass CFG
plus guidance-rescale 0.7 for the 512/1024 models, and weight types
t / ada / uniform (guidance_pipeline.py:392-414).

TPU-native design: the reference builds a surrogate MSE whose autograd
gradient equals the SDS gradient (guidance_pipeline.py:416-420); in JAX the
gradient IS the update — each optimization step is one jitted function
(UNet fwd + grad + Adam) with no surrogate graph, scanned on device in
chunks so the host only sees periodic loss scalars.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamicrafter_tpu import schedule as sched_lib
from dynamicrafter_tpu.sampling.ddim import CFGConditioning, SamplerSettings, \
    make_cfg_denoiser


@dataclasses.dataclass(frozen=True)
class SDSSettings:
    num_steps: int = 1000
    lr: float = 0.01
    cfg_scale: float = 7.5
    guidance_rescale: float = 0.0       # 0.7 for 512/1024
    weight_type: str = "t"              # t | ada | uniform
    min_step_ratio: float = 0.02
    max_step_ratio: float = 0.98
    ddim_grid_steps: int = 50
    timestep_spacing: str = "uniform"
    log_every: int = 50
    # reference guidance_pipeline.py:769-774: AdamW betas (0.9, 0.99),
    # Adam betas (0.9, 0.999), both eps 1e-8 (torch AdamW wd default 1e-2)
    optimizer_type: str = "Adam"        # Adam | AdamW
    negative_prompt: str = ""           # uncond text (guidance CLI:152-153)


class SDSGuidancePipeline:
    """Optimizes video latents by score distillation using a loaded
    DynamiCrafterPipeline's UNet + conditioning stack."""

    def __init__(self, pipe, settings: SDSSettings = SDSSettings()):
        self.pipe = pipe
        self.settings = settings
        s = settings
        grid = sched_lib.make_ddim_timesteps(
            s.timestep_spacing, s.ddim_grid_steps,
            pipe.schedule.num_timesteps)
        lo = int(len(grid) * s.min_step_ratio)
        hi = max(int(len(grid) * s.max_step_ratio), lo + 1)
        self._t_grid = jnp.asarray(grid[lo:hi], dtype=jnp.int32)

    def _make_step(self, cond: CFGConditioning, tx):
        pipe, s = self.pipe, self.settings
        schedule = pipe.schedule
        settings = SamplerSettings(
            cfg_scale=s.cfg_scale, guidance_rescale=s.guidance_rescale,
            parameterization=pipe.config.parameterization)
        model_fn = make_cfg_denoiser(pipe._unet_apply, pipe.params["unet"],
                                     cond, settings)
        t_grid = self._t_grid

        def sds_grad(latents, rng):
            b = latents.shape[0]
            r_t, r_n = jax.random.split(rng)
            t = t_grid[jax.random.randint(r_t, (b,), 0, t_grid.shape[0])]
            noise = jax.random.normal(r_n, latents.shape, latents.dtype)
            z_t = schedule.q_sample(latents, t, noise)
            model_output = model_fn(z_t, t)
            if pipe.config.parameterization == "v":
                eps = schedule.predict_eps_from_z_and_v(z_t, t, model_output)
            else:
                eps = model_output
            a_t = sched_lib.extract_into_tensor(
                schedule.alphas_cumprod, t, latents.ndim)
            x0_hat = (z_t - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            diff = latents - x0_hat
            if s.weight_type == "t":
                grad = (1.0 - a_t) * diff
            elif s.weight_type == "ada":
                wf = jnp.maximum(jnp.mean(jnp.abs(diff),
                                          axis=tuple(range(1, diff.ndim)),
                                          keepdims=True), 1e-4)
                grad = diff / wf
            elif s.weight_type == "uniform":
                grad = diff
            else:
                raise ValueError(s.weight_type)
            grad = jnp.nan_to_num(grad)
            # surrogate-equivalent loss for logging (guidance_pipeline.py:416-420)
            loss = 0.5 * jnp.mean(jnp.square(grad)) / b
            return grad, loss

        @jax.jit
        def chunk(latents, opt_state, rng, base_step):
            def body(carry, i):
                lat, opt, key = carry
                key, sub = jax.random.split(key)
                grad, loss = sds_grad(lat, sub)
                updates, opt = tx.update(grad, opt, lat)
                lat = optax.apply_updates(lat, updates)
                return (lat, opt, key), loss
            (latents, opt_state, rng), losses = jax.lax.scan(
                body, (latents, opt_state, rng),
                base_step + jnp.arange(s.log_every))
            return latents, opt_state, rng, losses

        return chunk

    def __call__(
        self,
        prompts: Sequence[str],
        videos: np.ndarray,                 # (B, T, H, W, 3) in [-1,1]
        *,
        seed: int = 123,
        fs: Optional[Sequence[int]] = None,
        init_latents: Optional[np.ndarray] = None,
        decode: bool = True,
        debug_dir: Optional[str] = None,
    ) -> Dict[str, np.ndarray]:
        pipe, s = self.pipe, self.settings
        videos = jnp.asarray(videos, dtype=jnp.float32)
        b, t = videos.shape[0], videos.shape[1]
        f = 2 ** (len(pipe.vae_config.ch_mult) - 1)
        lat_shape = (b, t, videos.shape[2] // f, videos.shape[3] // f,
                     pipe.vae_config.z_channels)

        rng = jax.random.PRNGKey(seed)
        rng, enc_rng, init_rng = jax.random.split(rng, 3)
        cond = pipe.build_conditioning(
            prompts, videos, enc_rng, cfg_scale=s.cfg_scale, fs=fs,
            negative_prompt=s.negative_prompt)

        if init_latents is not None:
            latents = jnp.asarray(init_latents)
        else:
            latents = jax.random.normal(init_rng, lat_shape, jnp.float32)

        if s.optimizer_type == "AdamW":
            tx = optax.adamw(s.lr, b1=0.9, b2=0.99, eps=1e-8,
                             weight_decay=1e-2)
        elif s.optimizer_type == "Adam":
            tx = optax.adam(s.lr, b1=0.9, b2=0.999, eps=1e-8)
        else:
            raise ValueError(f"unknown optimizer_type {s.optimizer_type!r}")
        opt_state = tx.init(latents)
        chunk = self._make_step(cond, tx)

        losses = []
        n_chunks = max(1, s.num_steps // s.log_every)
        dbg = _DebugWriter(debug_dir) if debug_dir else None
        for c in range(n_chunks):
            latents, opt_state, rng, chunk_losses = chunk(
                latents, opt_state, rng, jnp.int32(c * s.log_every))
            losses.append(np.asarray(chunk_losses))
            if dbg is not None:
                dbg.step(c * s.log_every, pipe.decode_latents(latents))
        loss_curve = np.concatenate(losses)

        out = {"latents": np.asarray(latents), "loss_curve": loss_curve}
        if decode:
            frames = pipe.decode_latents(latents)
            out["videos"] = np.asarray(frames)
        if dbg is not None:
            dbg.finish(loss_curve, log_every=s.log_every)
            out["debug_dir"] = debug_dir
        return out


class _DebugWriter:
    """Per-interval optimization dumps mirroring the reference debug tree
    (guidance_pipeline.py:527-751): step_XXXXXX_{frame_00.png, frame.png,
    video.mp4} per interval, an optimization_process.mp4 of mid-frames
    across intervals, loss_curve.csv, and a loss_analysis.png multi-panel
    (full log-curve / last-50 / change rate), matplotlib permitting."""

    def __init__(self, root: str):
        import os

        self.root = root
        self.debug = os.path.join(root, "debug")
        self.process = os.path.join(root, "process")
        os.makedirs(self.debug, exist_ok=True)
        os.makedirs(self.process, exist_ok=True)
        self._mid_frames = []

    def step(self, step_idx: int, frames) -> None:
        import os

        from dynamicrafter_tpu.utils.video import save_video, to_uint8

        vid = np.asarray(frames)[0]          # (T, H, W, 3) in [-1, 1]
        u8 = to_uint8(vid)
        base = os.path.join(self.debug, f"step_{step_idx:06d}")
        try:
            from PIL import Image

            Image.fromarray(u8[0]).save(base + "_frame_00.png")
            Image.fromarray(u8[len(u8) // 2]).save(base + "_frame.png")
        except ImportError:
            pass
        save_video(vid, base + "_video.mp4")
        self._mid_frames.append(vid[len(vid) // 2])

    def finish(self, loss_curve: np.ndarray, log_every: int) -> None:
        import os

        from dynamicrafter_tpu.utils.video import save_video

        if len(self._mid_frames) >= 2:
            save_video(np.stack(self._mid_frames),
                       os.path.join(self.process, "optimization_process.mp4"),
                       fps=4)
        with open(os.path.join(self.root, "loss_curve.csv"), "w") as f:
            f.write("step,loss\n")
            for i, v in enumerate(loss_curve):
                f.write(f"{i},{float(v)}\n")
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        axes[0].plot(loss_curve)
        axes[0].set_yscale("log")
        axes[0].set_title("Complete SDS Loss Curve")
        tail = loss_curve[-50:]
        axes[1].plot(range(len(loss_curve) - len(tail), len(loss_curve)), tail)
        axes[1].set_title("Last 50 Steps")
        if len(loss_curve) > 1:
            axes[2].plot(np.diff(loss_curve))
        axes[2].set_title("Loss Change Rate")
        for ax in axes:
            ax.grid(True)
            ax.set_xlabel("Step")
        fig.tight_layout()
        fig.savefig(os.path.join(self.root, "loss_analysis.png"), dpi=100)
        plt.close(fig)
