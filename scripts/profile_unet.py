"""Per-op device-time attribution for the UNet sampler step.

Runs ONE jitted UNet forward (the CFG-batched sampler inner call) at a
given resolution under jax.profiler.trace — which records real per-HLO
device times through the tunneled axon backend (vm.trace.json.gz) — and
prints device time aggregated by op class (convolution / attention-dot /
flash-kernel / other-dot / fusion-elementwise / transpose-copy / ...),
plus the top individual ops. This is the ground-truth view that
time_chained cannot give (tunnel RTT hides sub-30 ms structure).

Usage:
  python scripts/profile_unet.py --res 1024 [--batch 2] [--iters 3]
  python scripts/profile_unet.py --res 512 --csv /tmp/ops512.csv

The roofline summary in docs/DESIGN.md ("MFU and the 1024 roofline") was
produced with this script.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def classify(name: str) -> str:
    n = name.lower()
    if "flash" in n or "custom-call" in n or "tpu_custom_call" in n:
        return "flash_kernel"
    if n.startswith("%convolution") or "convolution" in n:
        return "convolution"
    if n.startswith("%dot") or re.match(r"%?dot", n):
        return "dot"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "transpose" in n or "copy" in n:
        return "transpose_copy"
    if "fusion" in n:
        return "fusion"
    if "reduce" in n:
        return "reduce"
    return "other"


def load_trace(trace_dir: str):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    assert paths, f"no trace under {trace_dir}"
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "args" in ev \
                    and "bytes_accessed" in ev.get("args", {}):
                events.append(ev)
    return events


def aggregate(events, iters: int):
    by_op, by_class = {}, {}
    total = 0.0
    for ev in events:
        dur_ms = ev.get("dur", 0) / 1000.0 / iters
        # collapse fusion.123 -> fusion, convolution.5 -> convolution
        base = re.sub(r"\.\d+$", "", ev.get("name", "?"))
        by_op[base] = by_op.get(base, 0.0) + dur_ms
        cls = classify(base)
        by_class[cls] = by_class.get(cls, 0.0) + dur_ms
        total += dur_ms
    return by_op, by_class, total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", default="1024", choices=["256", "512", "1024"])
    p.add_argument("--batch", type=int, default=2,
                   help="UNet batch (2 = batched-CFG inner call)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--trace_dir", default="/tmp/unet_prof")
    p.add_argument("--csv", default=None)
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_dctpu_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from bench import ResolutionBench
    from dynamicrafter_tpu.config import ModelConfig

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    mc = ModelConfig.from_yaml(
        os.path.join(here, "configs", f"inference_{args.res}_v1.0.yaml"))
    shapes = {"256": (32, 32), "512": (40, 64), "1024": (72, 128)}
    h, w = shapes[args.res]
    # b=1 ResolutionBench, then profile at the requested UNet batch (the
    # batched-CFG step runs the UNet at 2*b)
    rb = ResolutionBench(mc, 1, h, w, 50, jnp.bfloat16, sequential_cfg=False)
    bb = args.batch
    xin = jnp.zeros((bb, rb.t_len, h, w, 2 * rb.zc), rb.dtype)
    ts = jnp.zeros((bb,), jnp.int32)
    ct = jnp.zeros((bb, 77, rb.ctx_dim), rb.dtype)
    ci = jnp.zeros((bb, rb.t_len, rb.n_img_tok, rb.ctx_dim), rb.dtype)
    fs = jnp.zeros((bb,), jnp.int32)

    fn = jax.jit(rb.unet_apply)
    print(f"# compiling unet fwd res={args.res} batch={bb} ...", flush=True)
    out = fn(rb.uparams, xin, ts, ct, ci, fs)
    out.block_until_ready()

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            out = fn(rb.uparams, xin, ts, ct, ci, fs)
        out.block_until_ready()

    by_op, by_class, total = aggregate(load_trace(args.trace_dir),
                                       args.iters)
    print(f"\n== res {args.res} batch {bb}: device total "
          f"{total:.1f} ms/call ==")
    print("\nby class (ms/call):")
    for k, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {k:18s} {v:8.2f}  {100 * v / total:5.1f}%")
    print(f"\ntop {args.top} ops (ms/call):")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v:8.2f}  {k[:90]}")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("op,ms_per_call\n")
            for k, v in sorted(by_op.items(), key=lambda kv: -kv[1]):
                f.write(f"\"{k}\",{v:.4f}\n")
        print(f"\nwrote {args.csv}")


if __name__ == "__main__":
    main()
