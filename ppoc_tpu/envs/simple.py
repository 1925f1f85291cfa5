"""1-D integrator toy environment.

Pure-JAX equivalent of the reference's ``simple_env`` (``src/env.c:9-51``):
state accumulates the clipped action; reward 1 and terminate on reaching
state >= 5; truncate after 15 steps; gamma 0.99.  Unlike the reference's
file-scope-global single instance (src/env.c:6-7), this version is pure
state-passing and vectorizes to any number of instances.

Used as the fast learning smoke test, mirroring the reference's commented-in
swap at src/main.c:25-26.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .core import Env, EnvSpec, register

HORIZON = 15


class SimpleState(NamedTuple):
    s: jax.Array  # f32 scalar position
    t: jax.Array  # i32 step count


def _reset(key: jax.Array):
    del key
    st = SimpleState(jnp.zeros(()), jnp.zeros((), jnp.int32))
    return st, jnp.zeros((1,))


def _step(st: SimpleState, action: jax.Array, key: jax.Array):
    del key
    s = st.s + jnp.clip(action[0], -1.0, 1.0)
    t = st.t + 1
    terminated = s >= 5.0
    truncated = jnp.logical_and(t >= HORIZON, jnp.logical_not(terminated))
    reward = jnp.where(terminated, 1.0, 0.0)
    st2 = SimpleState(s, t)
    return st2, s[None], reward, terminated, truncated


@register("simple")
def make_simple() -> Env:
    spec = EnvSpec(
        name="simple",
        obs_dim=1,
        action_dim=1,
        horizon=HORIZON,
        gamma=0.99,
        action_low=-1.0,
        action_high=1.0,
    )
    return Env(spec=spec, reset=_reset, step=_step)
