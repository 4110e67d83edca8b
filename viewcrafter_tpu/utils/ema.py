"""Exponential moving average of parameters (training-side).

Parity: lvdm/ema.py:5-76 (LitEma) — decay warmup min(decay, (1+n)/(10+n)),
shadow buffers, store/restore swap. Functional pytree version.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EmaState:
    shadow: Any
    num_updates: jnp.ndarray  # int32 scalar; -1 disables warmup


def ema_init(params: Any, use_num_updates: bool = True) -> EmaState:
    return EmaState(
        shadow=jax.tree_util.tree_map(jnp.asarray, params),
        num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
    )


def ema_update(state: EmaState, params: Any, decay: float = 0.9999) -> EmaState:
    n = state.num_updates
    warm = jnp.where(n >= 0, (1.0 + n) / (10.0 + n), decay)
    d = jnp.minimum(decay, warm).astype(jnp.float32)
    one_minus = 1.0 - d
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p.astype(s.dtype)), state.shadow, params
    )
    return EmaState(shadow=shadow, num_updates=jnp.where(n >= 0, n + 1, n))


def ema_params(state: EmaState) -> Any:
    """The averaged parameters (the reference's copy_to)."""
    return state.shadow
