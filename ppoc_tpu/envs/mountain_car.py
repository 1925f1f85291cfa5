"""MountainCarContinuous-v0 dynamics as a pure-JAX environment.

Sparse-reward continuous-control config named in BASELINE.json.  Gymnasium
classic-control equations reproduced exactly (power 0.0015, gravity term
0.0025*cos(3p), wall at -1.2 zeroing negative velocity, +100 terminal bonus,
-0.1*a^2 action penalty); cross-checked in ``tests/test_envs.py``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .core import Env, EnvSpec, register

MIN_POSITION = -1.2
MAX_POSITION = 0.6
MAX_SPEED = 0.07
GOAL_POSITION = 0.45
GOAL_VELOCITY = 0.0
POWER = 0.0015
HORIZON = 999


class MountainCarState(NamedTuple):
    position: jax.Array
    velocity: jax.Array
    t: jax.Array


def _obs(s: MountainCarState) -> jax.Array:
    return jnp.stack([s.position, s.velocity])


def _reset(key: jax.Array):
    pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
    s = MountainCarState(pos, jnp.zeros(()), jnp.zeros((), jnp.int32))
    return s, _obs(s)


def _step(s: MountainCarState, action: jax.Array, key: jax.Array):
    del key
    force = jnp.clip(action[0], -1.0, 1.0)
    velocity = s.velocity + force * POWER - 0.0025 * jnp.cos(3.0 * s.position)
    velocity = jnp.clip(velocity, -MAX_SPEED, MAX_SPEED)
    position = jnp.clip(s.position + velocity, MIN_POSITION, MAX_POSITION)
    velocity = jnp.where(
        jnp.logical_and(position <= MIN_POSITION, velocity < 0.0), 0.0, velocity
    )
    t = s.t + 1
    terminated = jnp.logical_and(position >= GOAL_POSITION, velocity >= GOAL_VELOCITY)
    truncated = jnp.logical_and(t >= HORIZON, jnp.logical_not(terminated))
    # Gymnasium penalizes the RAW action, not the clipped force
    # (continuous_mountain_car.py: reward -= 0.1 * action[0]**2)
    reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * action[0] ** 2
    s2 = MountainCarState(position, velocity, t)
    return s2, _obs(s2), reward, terminated, truncated


@register("mountain_car")
def make_mountain_car() -> Env:
    spec = EnvSpec(
        name="mountain_car",
        obs_dim=2,
        action_dim=1,
        horizon=HORIZON,
        gamma=0.99,
        action_low=-1.0,
        action_high=1.0,
    )
    return Env(spec=spec, reset=_reset, step=_step)
