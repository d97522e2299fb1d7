"""DynamiCrafterPipeline: the end-to-end image-to-video orchestrator.

Replaces the reference's Lightning god-object + script stack
(lvdm/models/ddpm3d.py LatentVisualDiffusion + scripts/evaluation/inference.py
image_guided_synthesis + the fork's scripts/gradio/dynamicrafter_pipeline.py)
with a functional design: explicit param pytrees, jitted stage functions, the
whole DDIM loop inside one jit, and optional (dp, sp) mesh sharding.

Call path parity (scripts/evaluation/inference.py:216-313):
  embed image -> resampler tokens, embed text, VAE-encode cond frames,
  assemble hybrid conditioning (repeat / interp-zeros), CFG uncond variants,
  DDIM scan, per-frame (or tiled) VAE decode.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamicrafter_tpu import schedule as sched_lib
from dynamicrafter_tpu.config import ModelConfig
from dynamicrafter_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
    clip_preprocess,
)
from dynamicrafter_tpu.models.resampler import Resampler, ResamplerConfig
from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
from dynamicrafter_tpu.models.vae import (
    AutoencoderKL,
    DiagonalGaussian,
    VAEConfig,
    decode_tiled,
)
from dynamicrafter_tpu.parallel.sharding import use_mesh
from dynamicrafter_tpu.sampling.ddim import (
    CFGConditioning,
    SamplerSettings,
    ddim_sample,
    make_cfg_denoiser,
)
from dynamicrafter_tpu.sampling.dpm import dpm_sample
from dynamicrafter_tpu.sampling.unipc import unipc_sample
from dynamicrafter_tpu.utils import weights as W
from dynamicrafter_tpu.utils.tokenizer import default_tokenizer


@dataclasses.dataclass
class PipelineOutput:
    videos: np.ndarray  # (B, n_samples, T, H, W, 3) float in [-1, 1]
    # decoded x_inter intermediates when sample(log_every_t=...) is set:
    # (n_logs+1, B, T, H, W, 3), row 0 = decoded x_T (reference denoise-row
    # surface, ddpm3d.py:800-820 / samplers/ddim.py:157,199-201)
    denoise_rows: Optional[np.ndarray] = None


def _openclip_text_config(config) -> CLIPTextConfig:
    """FrozenOpenCLIPEmbedder layer= last|penultimate (condition.py:241);
    shared by the constructor and the checkpoint converter so the built
    tower and the converted layer count cannot drift."""
    csp = getattr(config, "cond_stage_params", {})
    kwargs = dict(config.clip_text)
    kwargs.setdefault(
        "penultimate", csp.get("layer", "penultimate") == "penultimate")
    return CLIPTextConfig(**kwargs)


class DynamiCrafterPipeline:
    def __init__(
        self,
        config: ModelConfig,
        params: Optional[Dict[str, Any]] = None,
        dtype=jnp.float32,
        mesh=None,
        tokenizer=None,
        tiled_vae_threshold: int = 64,
        bake_params: bool = False,
        cast_storage: bool = True,
    ):
        # cast_storage: cast param STORAGE to `dtype` (inference pipelines).
        # Training must pass False — AdamW master weights, moments, and the
        # 0.9999-EMA shadow all need fp32 storage (per-step updates ~1e-5
        # relative round away in bf16); compute still runs in `dtype`.
        self.config = config
        self.dtype = dtype
        self.cast_storage = cast_storage
        self.mesh = mesh
        self.tiled_vae_threshold = tiled_vae_threshold
        # bake_params: close the UNet weights over the jitted sampler as
        # compile-time constants — XLA pre-formats weight layouts, measured
        # ~9% faster steps on v5e, at the cost of a much longer compile and
        # an extra weight copy inside the executable. Serving-only knob.
        self.bake_params = bake_params

        self.unet_config = UNetConfig.from_dict(config.unet)
        self.vae_config = VAEConfig.from_dict(config.vae)
        self.unet = UNetModel(self.unet_config, dtype=dtype)
        self.vae = AutoencoderKL(self.vae_config, dtype=dtype)
        self.text_role = getattr(config, "cond_stage_role", "clip_text")
        csp = getattr(config, "cond_stage_params", {})
        if self.text_role == "clip_text":
            self.text_encoder = CLIPTextEncoder(
                _openclip_text_config(config), dtype=dtype)
        elif self.text_role == "clip_text_hf":
            # FrozenCLIPEmbedder (HF CLIP ViT-L text, condition.py:209-252)
            from dynamicrafter_tpu.models.encoders import (
                HFCLIPTextConfig, HFCLIPTextEncoder)
            kwargs = dict(config.clip_text)
            kwargs.pop("penultimate", None)  # open_clip-only knob
            kwargs.setdefault("layer", csp.get("layer", "last"))
            kwargs.setdefault("layer_idx", csp.get("layer_idx"))
            self.text_encoder = HFCLIPTextEncoder(HFCLIPTextConfig(**kwargs),
                                                  dtype=dtype)
        else:
            raise ValueError(
                f"text conditioning target {config.cond_stage_target!r} "
                f"(role {self.text_role!r}) is implemented in "
                "models/encoders.py but has no UNet context contract in the "
                "DynamiCrafter i2v pipeline (same in the reference).")
        if getattr(config, "img_cond_stage_role", "clip_vision") != "clip_vision":
            raise ValueError(
                f"image conditioning target {config.img_cond_stage_target!r} "
                "is implemented (models/encoders.py::CLIPVisionPooled) but the "
                "3D UNet's per-frame context split needs the all-tokens "
                "FrozenOpenCLIPImageEmbedderV2 + Resampler pair — a pooled "
                "embedder cannot produce the (T, 16, C) image context (the "
                "reference has the same shape contract, openaimodel3d.py:556).")
        self.vision_encoder = CLIPVisionEncoder(
            CLIPVisionConfig(**config.clip_vision), dtype=dtype)
        self.resampler = (Resampler(ResamplerConfig.from_dict(config.resampler),
                                    dtype=dtype)
                          if config.resampler else None)
        if tokenizer is None:
            # HF CLIPTokenizer pads with EOT (49407), open_clip with 0; pad
            # positions reach the UNet unmasked on the FrozenCLIPEmbedder
            # path (layer="last"/"hidden"), so the pad id must match there
            pad = (self.text_encoder.config.eos_token_id
                   if self.text_role == "clip_text_hf" else 0)
            tokenizer = default_tokenizer(pad_id=pad)
        self.tokenizer = tokenizer

        self.schedule = sched_lib.build_schedule(
            timesteps=config.timesteps,
            beta_schedule=config.beta_schedule,
            linear_start=config.linear_start,
            linear_end=config.linear_end,
            cosine_s=config.cosine_s,
            parameterization=config.parameterization,
            rescale_betas_zero_snr=config.rescale_betas_zero_snr,
            use_dynamic_rescale=config.use_dynamic_rescale,
            base_scale=config.base_scale,
            turning_step=config.turning_step,
        )
        if params is not None and dtype != jnp.float32 and cast_storage:
            # bf16 weight storage halves HBM and per-step weight bandwidth;
            # norm scales/biases stay fp32 (fp32-island semantics)
            params = W.cast_params(params, dtype)
        self.params = params

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, config_path: str, ckpt_path: str,
                        allow_hash_tokenizer: bool = False, **kw):
        """Load a released PyTorch checkpoint (any of the 3 formats).

        allow_hash_tokenizer: only for tests with fabricated checkpoints;
        real-weight loads hard-fail on the hash-tokenizer fallback.
        """
        config = ModelConfig.from_yaml(config_path)
        try:
            import torch
            sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        except ImportError:
            # serving hosts need no torch: zip-format .ckpt decoded with
            # the stdlib pickle + numpy (utils/torch_reader.py)
            from dynamicrafter_tpu.utils.torch_reader import (
                load_torch_checkpoint)
            sd = load_torch_checkpoint(ckpt_path)
        # unwrap/rename first (deepspeed ckpts nest tensors under 'module'),
        # THEN convert tensors to numpy
        sd = W.normalize_state_dict(sd)
        sd = {k: (v.float().numpy() if hasattr(v, "numpy") else np.asarray(v))
              for k, v in sd.items()}
        split = W.split_reference_checkpoint(sd)
        if getattr(config, "cond_stage_role", "clip_text") == "clip_text_hf":
            # FrozenCLIPEmbedder stores the HF model under 'transformer.'
            hf_sd = {k[len("transformer."):]: v
                     for k, v in split["clip_text"].items()
                     if k.startswith("transformer.")}
            if not hf_sd and split["clip_text"]:
                raise ValueError(
                    "config names FrozenCLIPEmbedder (HF CLIP text) but the "
                    "checkpoint's cond_stage_model keys are not under "
                    "'transformer.' — this looks like an OpenCLIP checkpoint; "
                    "use a FrozenOpenCLIPEmbedder cond_stage_config.")
            text_params = W.convert_hf_clip_text(hf_sd)
        else:
            tc = _openclip_text_config(config)
            n_text_layers = tc.layers - (1 if tc.penultimate else 0)
            text_params = W.convert_clip_text(split["clip_text"], n_text_layers)
        params = {
            "unet": W.convert_unet(split["unet"]),
            "vae": W.convert_vae(split["vae"]),
            "clip_text": text_params,
            "clip_vision": W.convert_clip_vision(split["clip_vision"]),
        }
        if split["resampler"]:
            params["resampler"] = W.convert_resampler(split["resampler"])
        pipe = cls(config, params=params, **kw)
        # real weights + hash-fallback tokenizer = silent garbage text
        # conditioning; hard-fail instead
        from dynamicrafter_tpu.utils.tokenizer import HashTokenizer
        if isinstance(pipe.tokenizer, HashTokenizer) and not allow_hash_tokenizer:
            raise FileNotFoundError(
                "loaded a real checkpoint but no CLIP BPE vocab is available "
                "(tokenizer fell back to HashTokenizer) — pass tokenizer= or "
                "install bpe_simple_vocab_16e6.txt.gz in a default location.")
        return pipe

    def init_random(self, seed: int = 0, latent_hw: Tuple[int, int] = (8, 8)):
        """Random-init all components (smoke runs without checkpoints)."""
        cfg = self.config
        t = self.unet_config.temporal_length or 4
        h, w = latent_hw
        keys = jax.random.split(jax.random.PRNGKey(seed), 5)
        ctx_dim = self.unet_config.context_dim
        n_img_tok = (self.resampler.config.num_queries
                     if self.resampler else 16)
        params = {}
        params["unet"] = jax.jit(self.unet.init)(
            keys[0],
            jnp.zeros((1, t, h, w, self.unet_config.in_channels)),
            jnp.zeros((1,), jnp.int32),
            context_text=jnp.zeros((1, 77, ctx_dim)),
            context_img=(jnp.zeros((1, t, n_img_tok, ctx_dim))
                         if self.unet_config.image_cross_attention else None),
            fs=jnp.zeros((1,), jnp.int32) if self.unet_config.fs_condition else None,
        )["params"]
        px = h * (2 ** (len(self.vae_config.ch_mult) - 1))
        params["vae"] = jax.jit(self.vae.init)(
            keys[1], jnp.zeros((1, px, px, 3)),
        )["params"]
        ctx_len = self.text_encoder.config.context_length
        params["clip_text"] = jax.jit(self.text_encoder.init)(
            keys[2], jnp.zeros((1, ctx_len), jnp.int32))["params"]
        vcfg = self.vision_encoder.config
        params["clip_vision"] = jax.jit(self.vision_encoder.init)(
            keys[3], jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))["params"]
        if self.resampler is not None:
            n_patches = (vcfg.image_size // vcfg.patch_size) ** 2 + 1
            params["resampler"] = jax.jit(self.resampler.init)(
                keys[4],
                jnp.zeros((1, n_patches, self.resampler.config.embedding_dim)),
            )["params"]
        if self.dtype != jnp.float32 and self.cast_storage:
            params = W.cast_params(params, self.dtype)
        self.params = params
        return params

    # ------------------------------------------------------------------
    # jitted stages
    # ------------------------------------------------------------------

    @functools.cached_property
    def _text_fn(self):
        return jax.jit(lambda p, tok: self.text_encoder.apply({"params": p}, tok))

    @functools.cached_property
    def _img_ctx_fn(self):
        def f(p_vision, p_resampler, images):
            vcfg = self.vision_encoder.config
            px = clip_preprocess(images, vcfg.image_size)
            tokens = self.vision_encoder.apply({"params": p_vision}, px)
            return self.resampler.apply({"params": p_resampler}, tokens)
        return jax.jit(f)

    @functools.cached_property
    def _encode_fn(self):
        def f(p_vae, frames, noise):
            # frames: (N, H, W, 3) in [-1, 1]
            moments = self.vae.apply({"params": p_vae}, frames,
                                     method=AutoencoderKL.encode_moments)
            z = DiagonalGaussian(moments).sample(noise)
            return z * self.config.scale_factor
        return jax.jit(f)

    @functools.cached_property
    def _decode_frame_fn(self):
        def f(p_vae, z):
            return self.vae.apply({"params": p_vae},
                                  z / self.config.scale_factor,
                                  method=AutoencoderKL.decode)
        return jax.jit(f)

    def decode_latents(self, z: jax.Array, perframe: Optional[bool] = None,
                       tiled: Optional[bool] = None) -> jax.Array:
        """z: (B, T, h, w, c) -> (B, T, H, W, 3).

        perframe mirrors the reference perframe_ae loop (ddpm3d.py:654-663)
        as a lax.map over frames; tiled adds spatial tiling for high-res.
        """
        b, t, h, w, c = z.shape
        if perframe is None:
            perframe = self.config.perframe_ae
        if tiled is None:
            tiled = max(h, w) > self.tiled_vae_threshold
        p_vae = self.params["vae"]
        flat = z.reshape(b * t, h, w, c)
        if tiled:
            decode = lambda zt: self._decode_frame_fn(p_vae, zt)
            scale = 2 ** (len(self.vae_config.ch_mult) - 1)
            out = decode_tiled(decode, flat, tile=self.tiled_vae_threshold,
                               overlap=8, scale=scale)
        elif perframe:
            out = jax.lax.map(
                lambda zt: self._decode_frame_fn(p_vae, zt[None])[0], flat)
        else:
            out = self._decode_frame_fn(p_vae, flat)
        return out.reshape(b, t, *out.shape[1:])

    # ------------------------------------------------------------------
    # conditioning assembly (inference.py:238-276)
    # ------------------------------------------------------------------

    def embed_text(self, prompts: Sequence[str]) -> jax.Array:
        tokens = jnp.asarray(self.tokenizer(list(prompts)))
        return self._text_fn(self.params["clip_text"], tokens)

    def embed_image_ctx(self, images: jax.Array) -> jax.Array:
        """images: (B, H, W, 3) in [-1,1] -> (B, T, Q, ctx_dim)."""
        ctx = self._img_ctx_fn(self.params["clip_vision"],
                               self.params["resampler"], images)
        b = ctx.shape[0]
        t = self.resampler.config.video_length or 1
        return ctx.reshape(b, t, -1, ctx.shape[-1])

    def encode_video(self, video: jax.Array, rng: jax.Array,
                     perframe: Optional[bool] = None) -> jax.Array:
        """video: (B, T, H, W, 3) in [-1,1] -> latents (B, T, h, w, 4).

        perframe mirrors the reference perframe_ae encode loop
        (ddpm3d.py:629-643) as a lax.map to bound peak memory at 576x1024.
        """
        b, t, h, w, _ = video.shape
        flat = video.reshape(b * t, h, w, 3)
        f = 2 ** (len(self.vae_config.ch_mult) - 1)
        zc = self.vae_config.z_channels
        noise = jax.random.normal(rng, (b * t, h // f, w // f, zc))
        if perframe is None:
            perframe = self.config.perframe_ae
        if perframe:
            z = jax.lax.map(
                lambda args: self._encode_fn(self.params["vae"],
                                             args[0][None], args[1][None])[0],
                (flat, noise))
        else:
            z = self._encode_fn(self.params["vae"], flat, noise)
        return z.reshape(b, t, *z.shape[1:])

    def build_conditioning(
        self,
        prompts: Sequence[str],
        videos: jax.Array,            # (B, T, H, W, 3) in [-1,1]
        rng: jax.Array,
        *,
        cfg_scale: float = 7.5,
        multiple_cond_cfg: bool = False,
        cfg_img: Optional[float] = None,
        loop_or_interp: bool = False,
        fs: Optional[Sequence[int]] = None,
        negative_prompt: str = "",
    ) -> CFGConditioning:
        b, t = videos.shape[0], videos.shape[1]
        img = videos[:, 0]

        img_ctx = self.embed_image_ctx(img)
        text_ctx = self.embed_text(prompts)

        z = self.encode_video(videos, rng)
        if loop_or_interp:
            # starting frame + zeros + ending frame (inference.py:246-249)
            cc = jnp.zeros_like(z)
            cc = cc.at[:, 0].set(z[:, 0]).at[:, -1].set(z[:, -1])
        else:
            cc = jnp.broadcast_to(z[:, :1], z.shape)

        passes_text = [text_ctx]
        passes_img = [img_ctx]
        if cfg_scale != 1.0:
            if self.config.uncond_type == "empty_seq":
                uc_text = self.embed_text([negative_prompt] * b)
            else:
                uc_text = jnp.zeros_like(text_ctx)
            uc_img = self.embed_image_ctx(jnp.zeros_like(img))
            if multiple_cond_cfg and (cfg_img or cfg_scale) != 1.0:
                # [uncond, uncond_img(text="",img=real), cond]
                passes_text = [uc_text, uc_text, text_ctx]
                passes_img = [uc_img, img_ctx, img_ctx]
            else:
                passes_text = [uc_text, text_ctx]
                passes_img = [uc_img, img_ctx]

        p = len(passes_text)
        concat = jnp.broadcast_to(cc[None], (p, *cc.shape))
        fs_arr = None
        if self.unet_config.fs_condition:
            fs_arr = jnp.asarray(fs if fs is not None
                                 else [self.unet_config.default_fs] * b,
                                 dtype=jnp.int32)
        return CFGConditioning(
            context_text=jnp.stack(passes_text),
            context_img=jnp.stack(passes_img),
            concat=concat,
            fs=fs_arr,
        )

    # ------------------------------------------------------------------
    # end-to-end sampling
    # ------------------------------------------------------------------

    def _unet_apply(self, params, x, ts, context_text, context_img, fs,
                    cache=None, return_cache=False):
        kw = {}
        if cache is not None:
            kw["cache"] = cache
        if return_cache:
            kw["return_cache"] = True
        return self.unet.apply({"params": params}, x, ts,
                               context_text=context_text,
                               context_img=context_img, fs=fs, **kw)

    def _sampler(self, settings: SamplerSettings,
                 log_every_t: Optional[int] = None):
        """One jitted function per (settings, log_every_t) covering the FULL
        DDIM scan."""
        if not hasattr(self, "_sampler_cache"):
            self._sampler_cache = {}
        key = (settings, log_every_t)
        if key in self._sampler_cache:
            return self._sampler_cache[key]
        if settings.sampler not in ("ddim", "dpm", "unipc"):
            raise ValueError(f"unknown sampler {settings.sampler!r}; "
                             "expected 'ddim', 'dpm' or 'unipc'")
        if settings.sampler != "ddim" and log_every_t is not None:
            raise ValueError("log_every_t intermediates are a DDIM-surface "
                             "feature (reference ddim.py:199-201); use "
                             "sampler='ddim'")
        # DPM++(2M)/UniPC are deterministic ODE solvers: their coefficients
        # ignore the table's eta-sigmas, so build the table at eta=0 there.
        table = sched_lib.build_ddim_table(
            self.schedule, num_steps=settings.steps,
            discretize=settings.discretize,
            eta=settings.eta if settings.sampler == "ddim" else 0.0)

        def _scan(model_fn, x_T, rng, mask, x0):
            if settings.sampler == "dpm":
                return dpm_sample(model_fn, x_T, self.schedule, table,
                                  settings, rng=rng, mask=mask, x0=x0)
            if settings.sampler == "unipc":
                return unipc_sample(model_fn, x_T, self.schedule, table,
                                    settings, rng=rng, mask=mask, x0=x0)
            return ddim_sample(model_fn, x_T, self.schedule, table,
                               settings, rng=rng, mask=mask, x0=x0,
                               log_every_t=log_every_t)

        if self.bake_params:
            baked = self.params["unet"]

            @functools.partial(jax.jit, static_argnums=())
            def run(unet_params, x_T, cond, rng, mask=None, x0=None):
                del unet_params  # baked as constants
                model_fn = make_cfg_denoiser(self._unet_apply, baked, cond,
                                             settings)
                return _scan(model_fn, x_T, rng, mask, x0)
        else:
            @jax.jit
            def run(unet_params, x_T, cond, rng, mask=None, x0=None):
                model_fn = make_cfg_denoiser(self._unet_apply, unet_params,
                                             cond, settings)
                return _scan(model_fn, x_T, rng, mask, x0)

        self._sampler_cache[key] = run
        return run

    def sample(
        self,
        prompts: Sequence[str],
        videos: np.ndarray,            # (B, T, H, W, 3) in [-1,1]
        *,
        steps: int = 50,
        cfg_scale: float = 7.5,
        cfg_img: Optional[float] = None,
        multiple_cond_cfg: bool = False,
        eta: float = 1.0,
        timestep_spacing: str = "uniform",
        guidance_rescale: float = 0.0,
        fs: Optional[Sequence[int]] = None,
        loop_or_interp: bool = False,
        n_samples: int = 1,
        seed: int = 123,
        x_T: Optional[np.ndarray] = None,
        decode: bool = True,
        negative_prompt: str = "",
        sequential_cfg: bool = False,
        deepcache: int = 1,
        mask: Optional[np.ndarray] = None,   # (B,T,h,w,c) 1=keep x0 latent
        x0_latents: Optional[np.ndarray] = None,
        log_every_t: Optional[int] = None,
        sampler: str = "ddim",
        solver_order: int = 2,
        use_corrector: bool = True,
    ):
        """Image-guided synthesis (reference inference.py:216-313).

        log_every_t: also collect the sampler's x_inter intermediates
        (reference ddim.py:199-201); with decode=True they come back decoded
        as PipelineOutput.denoise_rows, with decode=False the raw latent
        stack (n_logs+1, B, T, h, w, c) is returned alongside the latents.
        Requires n_samples == 1.

        sampler: "ddim" (the reference surface), "dpm" — DPM-Solver++(2M),
        a deterministic second-order solver of the same ODE (sampling/dpm.py)
        — or "unipc" — UniPC-style predictor-corrector (sampling/unipc.py);
        eta/log_every_t/deepcache are DDIM-only. solver_order (1..3) and
        use_corrector select the unipc scheme (ignored by ddim/dpm).
        """
        assert self.params is not None, "load or init params first"
        if log_every_t is not None and n_samples != 1:
            raise ValueError("log_every_t intermediates need n_samples=1")
        videos = jnp.asarray(videos, dtype=jnp.float32)
        b, t = videos.shape[0], videos.shape[1]
        f = 2 ** (len(self.vae_config.ch_mult) - 1)
        lat_shape = (b, t, videos.shape[2] // f, videos.shape[3] // f,
                     self.vae_config.z_channels)

        rng = jax.random.PRNGKey(seed)
        rng, enc_rng = jax.random.split(rng)

        with use_mesh(self.mesh):
            cond = self.build_conditioning(
                prompts, videos, enc_rng, cfg_scale=cfg_scale,
                multiple_cond_cfg=multiple_cond_cfg, cfg_img=cfg_img,
                loop_or_interp=loop_or_interp, fs=fs,
                negative_prompt=negative_prompt,
            )
            # eta is DDIM-only; normalize so dpm/unipc runs that differ only
            # in the (ignored) eta share one cache entry / executable
            settings = SamplerSettings(
                steps=steps, discretize=timestep_spacing,
                eta=eta if sampler == "ddim" else 0.0,
                cfg_scale=cfg_scale, cfg_img=cfg_img,
                guidance_rescale=guidance_rescale,
                parameterization=self.config.parameterization,
                sequential_cfg=sequential_cfg,
                deepcache=deepcache,
                sampler=sampler,
                solver_order=solver_order if sampler == "unipc" else 2,
                use_corrector=use_corrector if sampler == "unipc" else True,
            )
            run = self._sampler(settings, log_every_t)
            variants = []
            inter = None
            for k in range(n_samples):
                rng, sub = jax.random.split(rng)
                if x_T is not None:
                    xt = jnp.asarray(x_T)
                else:
                    xt = jax.random.normal(sub, lat_shape, jnp.float32)
                rng, noise_rng = jax.random.split(rng)
                z = run(self.params["unet"], xt, cond, noise_rng,
                        None if mask is None else jnp.asarray(mask),
                        None if x0_latents is None else jnp.asarray(x0_latents))
                if log_every_t is not None:
                    z, inter = z[0], z[1]["x_inter"]
                variants.append(z)
            z_all = jnp.stack(variants, axis=1)  # (B, n, T, h, w, c)
            if not decode:
                if log_every_t is not None:
                    return np.asarray(z_all), np.asarray(inter)
                return np.asarray(z_all)
            frames = jnp.stack(
                [self.decode_latents(z_all[:, k]) for k in range(n_samples)],
                axis=1)
            rows = None
            if log_every_t is not None:
                # decode each logged step's latents (the reference decodes
                # every zd in _get_denoise_row_from_list, ddpm3d.py:800-805)
                rows = np.stack([np.asarray(self.decode_latents(inter[j]))
                                 for j in range(inter.shape[0])])
        return PipelineOutput(videos=np.asarray(frames), denoise_rows=rows)
