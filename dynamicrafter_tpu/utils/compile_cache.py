"""Persistent XLA compilation cache (serving cold-start elimination).

Full-UNet graphs take 20-40 s to compile single-shape and 5-35 min through
the tunneled remote compiler at 576x1024 (docs/DESIGN.md "Measured");
JAX's persistent compilation cache serializes the compiled executable so
every later process with the same graph + same libtpu loads it instead of
recompiling. Verified working under the tunneled axon TPU backend
(cross-process: 0.7 s cold -> 0.04 s warm on a probe graph; see
docs/SERVING.md for the full-pipeline measurement).

The reference has no equivalent (torch eager pays no compile). Opt-in via
--compile_cache_dir on the CLIs or the standard JAX_COMPILATION_CACHE_DIR
env var, which JAX honors without this helper.
"""
from __future__ import annotations

import jax


def enable(cache_dir: str) -> None:
    """Enable the persistent compilation cache at cache_dir.

    Thresholds are zeroed so even fast-compiling helper graphs (VAE tiles,
    conditioning) cache — a serving restart replays the whole pipeline.
    Safe to call before or after backend init; entries key on the HLO +
    compile options + runtime version, so stale entries miss, not corrupt.
    """
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
