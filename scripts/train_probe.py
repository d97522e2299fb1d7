"""On-chip training-core probe: ms/step of the UNet fwd+bwd under each
remat policy.

Times the same "training core" documented in docs/DESIGN.md ("320x512 /
576x1024 training on the chip"): full-size UNet forward + backward +
grad-norm of the v-loss with random bf16 params — no optimizer update, no
frozen encoders (those are timed separately by bench.py's conditioning
stage). This is the piece the remat policy controls, so it is what the
policies are compared on. Reference recipe anchor: ~3 s/step at bs 2/GPU
on 8xA100 (/root/reference/configs/training_512_v1.0/config.yaml:155).

Policies (TrainConfig.remat_policy in training/trainer.py):
  dots        flat jax.checkpoint, dots_with_no_batch_dims_saveable
  dots_flash  dots + save flash out/lse residuals (skips the flash-forward
              recompute in the backward segment, like the "blocks" path's
              _flash_residual_policy does)
  blocks      per-layer nested nn.remat (required at 576x1024)
  none        no remat (OOMs above 256; kept for the lower bound)

Usage:
  python scripts/train_probe.py --res 512 --batch 2 --policies dots,dots_flash,blocks
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = {  # latent (h, w) per config
    256: ("configs/inference_256_v1.0.yaml", 32, 32),
    512: ("configs/inference_512_v1.0.yaml", 40, 64),
    1024: ("configs/inference_1024_v1.0.yaml", 72, 128),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512, choices=sorted(RES))
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--policies", default="dots,dots_flash")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dynamicrafter_tpu.config import ModelConfig
    from dynamicrafter_tpu.models.unet3d import UNetConfig, UNetModel
    from dynamicrafter_tpu.utils.timing import time_chained

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yaml_path, h, w = RES[args.res]
    mc = ModelConfig.from_yaml(os.path.join(here, yaml_path))
    unet_cfg = UNetConfig.from_dict(mc.unet)
    dtype = jnp.bfloat16
    b, t_len = args.batch, unet_cfg.temporal_length
    zc = 4

    xc = jax.random.normal(jax.random.PRNGKey(0),
                           (b, t_len, h, w, 2 * zc), dtype)
    target = jax.random.normal(jax.random.PRNGKey(1),
                               (b, t_len, h, w, zc), dtype)
    ts = jnp.full((b,), 500, jnp.int32)
    ctx_dim = unet_cfg.context_dim
    n_img_tok = (mc.resampler or {}).get("num_queries", 16)
    ct = jax.random.normal(jax.random.PRNGKey(2), (b, 77, ctx_dim),
                           dtype) * 0.1
    ci = jax.random.normal(jax.random.PRNGKey(3),
                           (b, t_len, n_img_tok, ctx_dim), dtype) * 0.1
    fs = jnp.full((b,), 24, jnp.int32)

    def random_params(module, *a, **kw):
        # close over args so static flags (deterministic) are not traced
        shapes = jax.eval_shape(
            lambda k: module.init(k, *a, **kw),
            jax.random.PRNGKey(0))["params"]
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
        vals = [jax.random.normal(k, s.shape, dtype) * 0.02
                for k, s in zip(keys, leaves)]
        return jax.tree_util.tree_unflatten(treedef, vals)

    results = {}
    for policy in args.policies.split(","):
        unet = UNetModel(unet_cfg, dtype=dtype,
                         remat_layers=(policy == "blocks"))
        params = random_params(unet, xc, ts, context_text=ct,
                               context_img=ci, fs=fs, deterministic=True)

        apply_fn = lambda p, x: unet.apply(
            {"params": p}, x, ts, context_text=ct, context_img=ci, fs=fs,
            deterministic=True)
        if policy == "dots":
            apply_fn = jax.checkpoint(
                apply_fn,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        elif policy == "dots_flash":
            apply_fn = jax.checkpoint(
                apply_fn,
                policy=jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "flash_out", "flash_lse")))
        elif policy not in ("blocks", "none"):
            raise SystemExit(f"unknown policy {policy!r}")

        def loss_fn(p, x):
            pred = apply_fn(p, x)
            return jnp.square(pred.astype(jnp.float32)
                              - target.astype(jnp.float32)).mean()

        def step(x, p):
            # carry = the noisy latent; chain the next iteration on the
            # grad-norm so the whole fwd+bwd is on the timed path
            loss, grads = jax.value_and_grad(loss_fn)(p, x)
            gn = jax.tree_util.tree_reduce(
                lambda acc, g: acc + jnp.sum(jnp.square(g.astype(jnp.float32))),
                grads, jnp.float32(0)) ** 0.5
            return x + (loss + gn).astype(dtype) * jnp.asarray(1e-30, dtype)

        try:
            sec = time_chained(step, xc, iters=args.iters, repeats=2,
                               args=(params,))
        except Exception as e:  # OOM at this policy/shape
            print(f"{policy}: FAILED ({type(e).__name__}: {str(e)[:200]})")
            results[policy] = None
            continue
        ms = sec * 1000.0
        results[policy] = ms
        print(f"{policy}: {ms:.1f} ms/step  (res {args.res}, b={b})")

    import json
    print(json.dumps({"res": args.res, "batch": b,
                      "ms_per_step": {k: (round(v, 1) if v else None)
                                      for k, v in results.items()}}))


if __name__ == "__main__":
    main()
