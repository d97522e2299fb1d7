"""Full-architecture random-weight parity vs the reference (CPU oracle).

The north-star gate (BASELINE.md: PSNR>40 vs reference frames with released
checkpoints) cannot run in this sandbox: zero egress, and no released
`model.ckpt` / BPE vocab is mounted. This script is the next-best proxy the
round-1 verdict asked for: the FULL 256-config architecture (320 model
channels, channel_mult [1,2,4,4], 2 res blocks, context 1024, T=16 — the
exact unet_config of configs/inference_256_v1.0.yaml) with random weights,
run end-to-end through the reference torch DDIMSampler
(/root/reference/lvdm/models/samplers/ddim.py) and through our jitted
sampler with identical injected noise, comparing final latents numerically.

Components (select with --component, default all):
  unet       one batched-CFG forward of the full 256 UNet (b=2 incl. CFG)
  ddim       --steps-step DDIM e2e latent parity (reference DDIMSampler
             oracle vs sampling/ddim.py), CFG scale 7.5
  vae        full 256 VAE decode of one 32x32 latent frame -> 256x256 pixels
             (+ encoder moments parity)
  clip       full ViT-H/14 text tower (w=1024,L=24) + vision tower
             (w=1280,L=32,patch 14) + full Resampler, one forward each
  pixels     ddim + decode both frameworks' final latents through matched
             VAE decoders -> a true end-to-end pixel-space PSNR (the same
             units as the BASELINE.md PSNR>40 gate)

Oracles are the same ones the test suite uses: the mounted reference for
UNet/DDIM/VAE, and tests/test_conditioning_parity.py's open_clip-layout
torch towers for CLIP (the reference's FrozenOpenCLIPEmbedder would try to
download pretrained weights; the oracle towers share its exact layout).

Writes a JSON line per component; `--out` appends a markdown table row
section to PARITY_RESULTS.md.

Runtime note: this box has ONE CPU core — the full UNet forward takes
minutes. Use --steps 2 (default) for the DDIM e2e; the per-step math is
separately bit-parity-tested in tests/test_ddim_parity.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def _psnr(a: np.ndarray, b: np.ndarray, data_range: float) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range ** 2 / mse)


def _report(name: str, ours: np.ndarray, ref: np.ndarray, seconds: float):
    ref = np.asarray(ref)
    ours = np.asarray(ours)
    rng_ = float(ref.max() - ref.min())
    row = {
        "component": name,
        "shape": list(ref.shape),
        "max_abs_err": float(np.max(np.abs(ours - ref))),
        "median_abs_err": float(np.median(np.abs(ours - ref))),
        "psnr_db": round(_psnr(ours, ref, rng_), 2),
        "data_range": round(rng_, 3),
        "seconds": round(seconds, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def _full_unet_cfg(mc):
    cfg_kw = dict(mc.unet)
    # dropout has no parameters and is identity at eval; zeroing it removes
    # any train-mode divergence risk. torch gradient checkpointing wraps
    # modules in a custom autograd Function — disable on both sides so the
    # compute graphs are identical.
    cfg_kw["dropout"] = 0.0
    cfg_kw["use_checkpoint"] = False
    return cfg_kw


def _vae_decoder_pair(mc, seed_base: int = 11):
    """Matched-random-weight (torch decode fn, jax decode fn) pair for
    latent->pixel decoding (reference autoencoder.py:30-57 decode path:
    post_quant_conv + Decoder)."""
    import torch

    import jax
    import jax.numpy as jnp

    from test_unet_parity import randomize_
    from test_vae_parity import torch_kwargs

    from dynamicrafter_tpu.models.vae import AutoencoderKL, VAEConfig
    from dynamicrafter_tpu.utils import weights as W

    sys.path.insert(0, REFERENCE_ROOT)
    from lvdm.modules.networks.ae_modules import Decoder as RefDecoder

    vcfg = VAEConfig.from_dict(mc.vae)
    dec = randomize_(RefDecoder(**torch_kwargs(vcfg)).eval(), seed=seed_base)
    zc, ed = vcfg.z_channels, vcfg.embed_dim
    post = torch.nn.Conv2d(ed, zc, 1)
    g = torch.Generator().manual_seed(seed_base + 1)
    torch.nn.init.normal_(post.weight, std=0.2, generator=g)
    torch.nn.init.normal_(post.bias, std=0.2, generator=g)
    sd = {"decoder." + k: v.numpy() for k, v in dec.state_dict().items()}
    sd.update({"post_quant_conv." + k: v.numpy()
               for k, v in post.state_dict().items()})
    # convert_vae converts exactly the keys given; decoder+post_quant_conv
    # is all the decode path touches.
    params = W.convert_vae(sd)
    ours = AutoencoderKL(vcfg)

    def torch_decode(z_bcthw):
        with torch.no_grad():
            frames = [dec(post(torch.tensor(z_bcthw[:, :, i])))
                      for i in range(z_bcthw.shape[2])]
        return np.stack([f.numpy() for f in frames], axis=2)

    jit_dec = jax.jit(lambda z: ours.apply({"params": params}, z,
                                           method=AutoencoderKL.decode))

    def jax_decode(z_bcthw):
        outs = []
        for i in range(z_bcthw.shape[2]):
            z = jnp.asarray(np.transpose(z_bcthw[:, :, i], (0, 2, 3, 1)))
            outs.append(np.transpose(np.asarray(jit_dec(z)), (0, 3, 1, 2)))
        return np.stack(outs, axis=2)

    return torch_decode, jax_decode


def run_unet_and_ddim(mc, args, do_ddim: bool, do_pixels: bool = False):
    import torch

    import jax
    import jax.numpy as jnp

    from test_unet_parity import randomize_
    from test_ddim_parity import FakeLDM, _jax_cond

    from dynamicrafter_tpu import schedule as S
    from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
    from dynamicrafter_tpu.sampling.ddim import (
        SamplerSettings, ddim_sample, make_cfg_denoiser,
    )
    from dynamicrafter_tpu.utils import weights as W

    sys.path.insert(0, REFERENCE_ROOT)
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    cfg_kw = _full_unet_cfg(mc)
    t0 = time.time()
    ref = randomize_(RefUNet(**cfg_kw).eval(), seed=0)
    params = W.convert_unet(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    ours = UNetModel(UNetConfig.from_dict(cfg_kw))
    print(f"built full UNet ({sum(v.numel() for v in ref.parameters())/1e6:.0f}M "
          f"params) in {time.time()-t0:.0f}s", flush=True)

    b, t = 1, cfg_kw["temporal_length"]
    h, w = args.height // 8, args.width // 8
    zc, ctx_dim = mc.unet["out_channels"], cfg_kw["context_dim"]
    nq = mc.resampler["num_queries"]
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2 * b, 2 * zc, t, h, w)).astype(np.float32) * 0.5
    ts = np.array([981, 501], dtype=np.int64)
    fs = np.array([3, 3], dtype=np.int64)
    ctx = rng.standard_normal((2 * b, 77 + t * nq, ctx_dim)).astype(np.float32)

    rows = []

    # --- single batched-CFG-shape forward ---
    t0 = time.time()
    with torch.no_grad():
        out_ref = ref(torch.tensor(x), torch.tensor(ts),
                      context=torch.tensor(ctx), fs=torch.tensor(fs)).numpy()
    print(f"torch forward: {time.time()-t0:.0f}s", flush=True)

    t1 = time.time()
    out = jax.jit(ours.apply)(
        {"params": params},
        jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))), jnp.asarray(ts),
        context_text=jnp.asarray(ctx[:, :77]),
        context_img=jnp.asarray(ctx[:, 77:].reshape(2 * b, t, nq, ctx_dim)),
        fs=jnp.asarray(fs))
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    print(f"jax forward (incl compile): {time.time()-t1:.0f}s", flush=True)
    rows.append(_report("unet_forward_full256", out, out_ref,
                        time.time() - t0))

    if not do_ddim:
        return rows

    # --- K-step DDIM e2e with CFG ---
    t0 = time.time()
    from lvdm.models.samplers.ddim import DDIMSampler

    DDIMSampler.register_buffer = lambda self, name, attr: setattr(
        self, name, attr)

    sched = S.build_schedule(
        timesteps=mc.timesteps, linear_start=mc.linear_start,
        linear_end=mc.linear_end, parameterization=mc.parameterization,
        rescale_betas_zero_snr=mc.rescale_betas_zero_snr,
        use_dynamic_rescale=mc.use_dynamic_rescale, base_scale=mc.base_scale)

    x_T = rng.standard_normal((b, zc, t, h, w)).astype(np.float32)
    ctx_c = rng.standard_normal((b, 77 + t * nq, ctx_dim)).astype(np.float32)
    ctx_u = rng.standard_normal((b, 77 + t * nq, ctx_dim)).astype(np.float32)
    concat = rng.standard_normal((b, zc, t, h, w)).astype(np.float32)
    fs1 = np.array([3] * b, dtype=np.int64)
    steps, cfg_scale, spacing = args.steps, 7.5, "uniform"

    fake = FakeLDM(ref, sched, mc.parameterization, mc.use_dynamic_rescale)
    sampler = DDIMSampler(fake)
    with torch.no_grad():
        samples, _ = sampler.sample(
            S=steps, batch_size=b, shape=(zc, t, h, w),
            conditioning={"c_crossattn": [torch.tensor(ctx_c)],
                          "c_concat": [torch.tensor(concat)]},
            x_T=torch.tensor(x_T), eta=0.0, verbose=False,
            unconditional_guidance_scale=cfg_scale,
            unconditional_conditioning={
                "c_crossattn": [torch.tensor(ctx_u)],
                "c_concat": [torch.tensor(concat)]},
            fs=torch.tensor(fs1), timestep_spacing=spacing,
            guidance_rescale=0.0, schedule_verbose=False)
    out_ref = samples.numpy()
    print(f"torch {steps}-step DDIM: {time.time()-t0:.0f}s", flush=True)

    t1 = time.time()
    table = S.build_ddim_table(sched, num_steps=steps, discretize=spacing,
                               eta=0.0)
    settings = SamplerSettings(
        steps=steps, discretize=spacing, eta=0.0, cfg_scale=cfg_scale,
        guidance_rescale=0.0, parameterization=mc.parameterization)
    cfg_cond = _jax_cond([ctx_u, ctx_c], concat, t, ctx_dim, fs1)

    def unet_apply(p, xin, tsin, context_text, context_img, fs):
        return ours.apply({"params": p}, xin, tsin,
                          context_text=context_text,
                          context_img=context_img, fs=fs)

    model_fn = make_cfg_denoiser(unet_apply, params, cfg_cond, settings)
    out = jax.jit(
        lambda xt: ddim_sample(model_fn, xt, sched, table, settings)
    )(jnp.asarray(np.transpose(x_T, (0, 2, 3, 4, 1))))
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    print(f"jax {steps}-step DDIM (incl compile): {time.time()-t1:.0f}s",
          flush=True)
    rows.append(_report(f"ddim{steps}_cfg_e2e_full256", out, out_ref,
                        time.time() - t0))

    if do_pixels:
        # Decode each framework's OWN latents through its OWN (matched
        # random-weight) VAE decoder — a true end-to-end pixel PSNR, the
        # same units as the BASELINE.md PSNR>40 gate. A frame subset keeps
        # the single-core torch decode bounded.
        t0 = time.time()
        torch_dec, jax_dec = _vae_decoder_pair(mc)
        sf = mc.scale_factor
        idx = sorted({0, t // 2, t - 1})
        px_ref = torch_dec((out_ref / sf)[:, :, idx])
        px_ours = jax_dec((out / sf)[:, :, idx])
        rows.append(_report(f"pixels_ddim{steps}_e2e",
                            px_ours, px_ref, time.time() - t0))
    return rows


def run_vae(mc, args):
    import torch

    import jax
    import jax.numpy as jnp

    from test_unet_parity import randomize_
    from test_vae_parity import torch_kwargs

    from dynamicrafter_tpu.models.vae import AutoencoderKL, VAEConfig
    from dynamicrafter_tpu.utils import weights as W

    # The reference's Lightning AutoencoderKL shell needs pytorch_lightning
    # (absent here); assemble its exact compute parts instead
    # (autoencoder.py:30-57: Encoder + quant_conv / post_quant_conv + Decoder)
    sys.path.insert(0, REFERENCE_ROOT)
    from lvdm.modules.networks.ae_modules import (
        Decoder as RefDecoder, Encoder as RefEncoder,
    )

    vcfg = VAEConfig.from_dict(mc.vae)
    t0 = time.time()
    enc = randomize_(RefEncoder(**torch_kwargs(vcfg)).eval(), seed=1)
    dec = randomize_(RefDecoder(**torch_kwargs(vcfg)).eval(), seed=2)
    zc, ed = vcfg.z_channels, vcfg.embed_dim
    quant = torch.nn.Conv2d(2 * zc, 2 * ed, 1)
    post = torch.nn.Conv2d(ed, zc, 1)
    g = torch.Generator().manual_seed(7)
    for m in (quant, post):
        torch.nn.init.normal_(m.weight, std=0.2, generator=g)
        torch.nn.init.normal_(m.bias, std=0.2, generator=g)
    sd = {}
    sd.update({"encoder." + k: v.numpy() for k, v in enc.state_dict().items()})
    sd.update({"decoder." + k: v.numpy() for k, v in dec.state_dict().items()})
    sd.update({"quant_conv." + k: v.numpy()
               for k, v in quant.state_dict().items()})
    sd.update({"post_quant_conv." + k: v.numpy()
               for k, v in post.state_dict().items()})
    params = W.convert_vae(sd)
    ours = AutoencoderKL(vcfg)

    rng = np.random.default_rng(7)
    z = rng.standard_normal((1, ed, args.height // 8,
                             args.width // 8)).astype(np.float32)
    px = rng.uniform(-1, 1, (1, 3, args.height, args.width)).astype(np.float32)

    rows = []
    with torch.no_grad():
        dec_ref = dec(post(torch.tensor(z))).numpy()
        mom_ref = quant(enc(torch.tensor(px))).numpy()
    dec_j = ours.apply({"params": params},
                       jnp.asarray(np.transpose(z, (0, 2, 3, 1))),
                       method=AutoencoderKL.decode)
    mom = ours.apply({"params": params},
                     jnp.asarray(np.transpose(px, (0, 2, 3, 1))),
                     method=AutoencoderKL.encode_moments)
    dec = dec_j
    rows.append(_report("vae_decode_full256",
                        np.transpose(np.asarray(dec), (0, 3, 1, 2)), dec_ref,
                        time.time() - t0))
    rows.append(_report("vae_encode_moments_full256",
                        np.transpose(np.asarray(mom), (0, 3, 1, 2)), mom_ref,
                        time.time() - t0))
    return rows


def run_clip(mc, args):
    import torch

    import jax.numpy as jnp

    # conditioning_parity's randomize_ skips the registered attn_mask buffer
    # (randomizing it would silently destroy the torch oracle's causal mask)
    from test_conditioning_parity import (
        _OracleTextTower, _OracleVisionTower, randomize_,
    )

    from dynamicrafter_tpu.models.clip import (
        CLIPTextConfig, CLIPTextEncoder, CLIPVisionConfig, CLIPVisionEncoder,
    )
    from dynamicrafter_tpu.utils import weights as W

    rows = []
    # ViT-H/14 text tower: the exact dims of the reference's
    # FrozenOpenCLIPEmbedder(arch='ViT-H-14') (condition.py:200-238)
    t0 = time.time()
    tc = CLIPTextConfig(vocab_size=49408, width=1024, heads=16, layers=24,
                        context_length=77)
    oracle = _OracleTextTower(tc.vocab_size, tc.width, tc.heads, tc.layers,
                              tc.context_length).eval()
    randomize_(oracle, seed=2)
    tokens = np.random.default_rng(3).integers(
        0, tc.vocab_size, (2, 77), dtype=np.int64)
    with torch.no_grad():
        ref_out = oracle(torch.tensor(tokens)).numpy()
    sd = {"model." + k: v.numpy() for k, v in oracle.state_dict().items()}
    params = W.convert_clip_text(sd, n_layers=tc.layers - 1)
    ours = CLIPTextEncoder(tc)
    out = ours.apply({"params": params},
                     jnp.asarray(tokens.astype(np.int32)))
    rows.append(_report("clip_text_vith14", np.asarray(out), ref_out,
                        time.time() - t0))

    # ViT-H/14 vision tower (all-token output, condition.py:310-340)
    t0 = time.time()
    vc = CLIPVisionConfig(width=1280, heads=16, layers=32, patch_size=14,
                          image_size=224)
    voracle = _OracleVisionTower(vc.width, vc.heads, vc.layers, vc.patch_size,
                                 vc.image_size).eval()
    randomize_(voracle, seed=3)
    img = np.random.default_rng(4).standard_normal(
        (1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        vref = voracle(torch.tensor(img)).numpy()
    vsd = {"model.visual." + k: v.numpy()
           for k, v in voracle.state_dict().items()}
    vparams = W.convert_clip_vision(vsd)
    vours = CLIPVisionEncoder(vc)
    vout = vours.apply({"params": vparams},
                       jnp.asarray(np.transpose(img, (0, 2, 3, 1))))
    rows.append(_report("clip_vision_vith14", np.asarray(vout), vref,
                        time.time() - t0))

    # Full resampler (dim 1024, depth 4, heads 12) — oracle from the
    # mounted reference
    t0 = time.time()
    sys.path.insert(0, REFERENCE_ROOT)
    from lvdm.modules.encoders.resampler import Resampler as RefResampler

    from dynamicrafter_tpu.models.resampler import Resampler, ResamplerConfig

    rp = dict(mc.resampler)
    rref = RefResampler(**rp).eval()
    randomize_(rref, seed=5)
    n_tok = (vc.image_size // vc.patch_size) ** 2 + 1
    feats = np.random.default_rng(6).standard_normal(
        (rp["video_length"], n_tok, rp["embedding_dim"])).astype(np.float32)
    with torch.no_grad():
        rref_out = rref(torch.tensor(feats)).numpy()
    rcfg = ResamplerConfig.from_dict(mc.resampler)
    rparams = W.convert_resampler(
        {k: v.numpy() for k, v in rref.state_dict().items()})
    rout = Resampler(rcfg).apply({"params": rparams}, jnp.asarray(feats))
    rows.append(_report("resampler_full", np.asarray(rout), rref_out,
                        time.time() - t0))
    return rows


def run_alt_encoders(mc, args):
    """Full-size rows for the alternate conditioning encoders.

    Oracles are the EXACT HF modules the reference wraps
    (condition.py:175-252): CLIPTextModel at openai/clip-vit-large-patch14
    dims and T5EncoderModel at google/t5-v1_1-large dims, random-init
    offline (no hub access needed).
    """
    import torch
    import transformers

    import jax.numpy as jnp

    from dynamicrafter_tpu.models.encoders import (
        HFCLIPTextConfig, HFCLIPTextEncoder, T5Config, T5Encoder,
    )
    from dynamicrafter_tpu.utils import weights as W

    rows = []
    # --- HF CLIP ViT-L/14 text tower (FrozenCLIPEmbedder, layer="last")
    t0 = time.time()
    # openai/clip-vit-large-patch14 text dims (HF class defaults are ViT-B)
    hcfg = transformers.CLIPTextConfig(
        hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12)
    torch.manual_seed(7)
    oracle = transformers.CLIPTextModel(hcfg).eval()
    tokens = np.random.default_rng(8).integers(
        0, hcfg.vocab_size, (2, 77), dtype=np.int64)
    with torch.no_grad():
        ref = oracle(input_ids=torch.tensor(tokens)).last_hidden_state.numpy()
    params = W.convert_hf_clip_text(
        {k: v.numpy() for k, v in oracle.state_dict().items()})
    cfg = HFCLIPTextConfig()  # matching ViT-L defaults
    out = HFCLIPTextEncoder(cfg).apply(
        {"params": params}, jnp.asarray(tokens.astype(np.int32)))
    rows.append(_report("hf_clip_text_vitl14", np.asarray(out), ref,
                        time.time() - t0))

    # --- T5 v1_1-large encoder (FrozenT5Embedder)
    t0 = time.time()
    tcfg5 = transformers.T5Config(
        vocab_size=32128, d_model=1024, d_kv=64, d_ff=2816, num_layers=24,
        num_heads=16, feed_forward_proj="gated-gelu", dropout_rate=0.0)
    torch.manual_seed(9)
    t5 = transformers.T5EncoderModel(tcfg5).eval()
    t5toks = np.random.default_rng(10).integers(
        0, tcfg5.vocab_size, (2, 77), dtype=np.int64)
    with torch.no_grad():
        t5ref = t5(input_ids=torch.tensor(t5toks)).last_hidden_state.numpy()
    t5params = W.convert_t5_encoder(
        {k: v.numpy() for k, v in t5.state_dict().items()})
    t5out = T5Encoder(T5Config()).apply(
        {"params": t5params}, jnp.asarray(t5toks.astype(np.int32)))
    rows.append(_report("t5_v1_1_large_encoder", np.asarray(t5out), t5ref,
                        time.time() - t0))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/inference_256_v1.0.yaml")
    p.add_argument("--component", default="all",
                   choices=["all", "unet", "ddim", "vae", "clip", "pixels",
                            "encoders"])
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--out", default=None,
                   help="append a markdown section to this file")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from dynamicrafter_tpu.config import ModelConfig

    mc = ModelConfig.from_yaml(args.config)
    rows = []
    if args.component in ("all", "clip"):
        rows += run_clip(mc, args)
    if args.component in ("all", "encoders"):
        rows += run_alt_encoders(mc, args)
    if args.component in ("all", "vae"):
        rows += run_vae(mc, args)
    if args.component in ("all", "unet", "ddim", "pixels"):
        rows += run_unet_and_ddim(
            mc, args, do_ddim=args.component in ("all", "ddim", "pixels"),
            do_pixels=args.component in ("all", "pixels"))

    if args.out:
        with open(args.out, "a") as f:
            f.write(f"\n### {args.config} @ {args.height}x{args.width}, "
                    f"steps={args.steps}\n\n")
            f.write("| component | shape | max abs err | median abs err | "
                    "PSNR (dB) | range |\n|---|---|---|---|---|---|\n")
            for r in rows:
                f.write(f"| {r['component']} | {tuple(r['shape'])} | "
                        f"{r['max_abs_err']:.2e} | {r['median_abs_err']:.2e} "
                        f"| {r['psnr_db']} | {r['data_range']} |\n")
        print(f"appended {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
