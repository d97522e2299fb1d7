"""Pytree EMA with warmup decay.

Behavioral parity target: LitEma (lvdm/ema.py:5-76) — shadow weights updated
as s -= (1-d)*(s-p) with d = min(decay, (1+n)/(10+n)), plus store/restore for
eval swaps. Here the shadow is just a params pytree.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    return jax.tree_util.tree_map(jnp.asarray, params)


def ema_update(shadow: Any, params: Any, num_updates: jax.Array,
               decay: float = 0.9999) -> Any:
    d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
    return jax.tree_util.tree_map(
        lambda s, p: s - (1.0 - d) * (s - p), shadow, params)
