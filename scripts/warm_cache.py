"""Pre-warm the persistent XLA compile cache for the default bench graphs.

The driver runs `python bench.py` under a wall-clock timeout; each
full-size UNet graph costs ~5-10 min through the tunneled remote compiler
when cold, so a cold cache can eat the whole budget (round-4 rc=124).
This script compiles exactly the bench graph set — the default rows PLUS
the opt-in 1024 extras and the MFU cost-analysis graphs — by running
bench.py with BENCH_WARM_ONLY=1 (every graph compiled + executed once, no
repeat timing), then runs it a second time in a FRESH process and checks
the wall time collapsed, proving the cache key survives process restarts
(it once didn't: the axon sitecustomize plugin binds jax config at
interpreter startup, so the cache dir must be set via jax.config.update —
bench.py does this; this script verifies it end to end).

Usage: python scripts/warm_cache.py [--skip-verify]
Exit 0: cache warm and verified. Exit 1: second run not meaningfully
faster — the persistent cache is NOT working; driver bench runs will
recompile everything.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench_once(tag: str) -> float:
    env = dict(os.environ)
    env["BENCH_WARM_ONLY"] = "1"      # one compile+execute per graph
    env["BENCH_1024_EXTRAS"] = "1"    # warm the opt-in rows too
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, stdout=subprocess.PIPE, text=True)
    dt = time.time() - t0
    last = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    print(f"[{tag}] rc={proc.returncode} wall={dt:.0f}s "
          f"json_lines={len(last)}", flush=True)
    if proc.returncode != 0 or not last:
        print(proc.stdout[-2000:], file=sys.stderr)
        sys.exit(f"[{tag}] bench failed")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-verify", action="store_true",
                   help="only warm; skip the fresh-process re-run check")
    args = p.parse_args()

    t1 = run_bench_once("warm")
    if args.skip_verify:
        return
    t2 = run_bench_once("verify-fresh-process")
    # The warmed run is pure device time (~4-6 min incl. extras). If the
    # first run hit cold compiles, t2 << t1. If the first run was already
    # warm, t1 ~= t2 — accept when t2 is itself small enough that no
    # multi-minute compile can be hiding in it.
    if t2 < max(0.6 * t1, 420):
        print(f"cache OK: fresh-process run {t2:.0f}s "
              f"(first run {t1:.0f}s)")
    else:
        sys.exit(f"persistent compile cache NOT effective: fresh-process "
                 f"run {t2:.0f}s vs first {t1:.0f}s — driver bench runs "
                 "will recompile (check jax_compilation_cache_dir wiring)")


if __name__ == "__main__":
    main()
