"""Pendulum-v1 dynamics as a pure-JAX environment.

Replaces the reference's env id 0, which steps Gymnasium's Pendulum-v1
through an embedded CPython interpreter one step at a time
(``scripts/gym_env.py:11-13``, ``src/gym_env.c:61-93``).  The physics below
are the Gymnasium classic-control equations reproduced exactly (semi-implicit
Euler, torque clip, speed clip, angle-normalized cost) so learning curves are
comparable; ``tests/test_envs.py`` checks step-for-step agreement against the
installed ``gymnasium`` implementation.

Pendulum never terminates; episodes end by truncation at horizon 200.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .core import Env, EnvSpec, register

MAX_SPEED = 8.0
MAX_TORQUE = 2.0
DT = 0.05
G = 10.0
M = 1.0
L = 1.0
HORIZON = 200


class PendulumState(NamedTuple):
    theta: jax.Array      # f32 scalar
    theta_dot: jax.Array  # f32 scalar
    t: jax.Array          # i32 scalar, steps since reset


def _obs(s: PendulumState) -> jax.Array:
    return jnp.stack([jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot])


def _angle_normalize(x):
    return ((x + jnp.pi) % (2.0 * jnp.pi)) - jnp.pi


def _reset(key: jax.Array):
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
    theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
    s = PendulumState(theta, theta_dot, jnp.zeros((), jnp.int32))
    return s, _obs(s)


def _step(s: PendulumState, action: jax.Array, key: jax.Array):
    del key  # deterministic dynamics
    u = jnp.clip(action[0], -MAX_TORQUE, MAX_TORQUE)
    cost = (
        _angle_normalize(s.theta) ** 2
        + 0.1 * s.theta_dot ** 2
        + 0.001 * u ** 2
    )
    new_theta_dot = s.theta_dot + (
        3.0 * G / (2.0 * L) * jnp.sin(s.theta) + 3.0 / (M * L ** 2) * u
    ) * DT
    new_theta_dot = jnp.clip(new_theta_dot, -MAX_SPEED, MAX_SPEED)
    new_theta = s.theta + new_theta_dot * DT
    t = s.t + 1
    s2 = PendulumState(new_theta, new_theta_dot, t)
    terminated = jnp.zeros((), bool)
    truncated = t >= HORIZON
    return s2, _obs(s2), -cost, terminated, truncated


@register("pendulum")
def make_pendulum() -> Env:
    spec = EnvSpec(
        name="pendulum",
        obs_dim=3,
        action_dim=1,
        horizon=HORIZON,
        gamma=0.99,  # reference sets gamma=0.99 for gym envs (src/gym_env.c:102)
        action_low=-MAX_TORQUE,
        action_high=MAX_TORQUE,
    )
    return Env(spec=spec, reset=_reset, step=_step)
