"""CartPole-v1 dynamics as a pure-JAX environment (discrete actions).

The reference framework has no discrete-action path; this env plus the
categorical policy in ``ppoc_tpu/models/policy.py`` extends the trainer to the
CartPole-v1 config named in BASELINE.json.  Physics are the Gymnasium
classic-control equations (Euler integration) reproduced exactly; see
``tests/test_envs.py`` for the step-for-step cross-check.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .core import Env, EnvSpec, register

GRAVITY = 9.8
MASSCART = 1.0
MASSPOLE = 0.1
TOTAL_MASS = MASSCART + MASSPOLE
LENGTH = 0.5  # half the pole length
POLEMASS_LENGTH = MASSPOLE * LENGTH
FORCE_MAG = 10.0
TAU = 0.02
THETA_THRESHOLD = 12.0 * 2.0 * jnp.pi / 360.0
X_THRESHOLD = 2.4
HORIZON = 500


class CartPoleState(NamedTuple):
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


def _obs(s: CartPoleState) -> jax.Array:
    return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot])


def _reset(key: jax.Array):
    v = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
    s = CartPoleState(v[0], v[1], v[2], v[3], jnp.zeros((), jnp.int32))
    return s, _obs(s)


def _step(s: CartPoleState, action: jax.Array, key: jax.Array):
    del key
    # action is an int32 scalar in {0, 1} (shape [1] for interface uniformity)
    a = action.reshape(()).astype(jnp.float32)
    force = jnp.where(a > 0.5, FORCE_MAG, -FORCE_MAG)
    costheta = jnp.cos(s.theta)
    sintheta = jnp.sin(s.theta)
    temp = (force + POLEMASS_LENGTH * s.theta_dot ** 2 * sintheta) / TOTAL_MASS
    theta_acc = (GRAVITY * sintheta - costheta * temp) / (
        LENGTH * (4.0 / 3.0 - MASSPOLE * costheta ** 2 / TOTAL_MASS)
    )
    x_acc = temp - POLEMASS_LENGTH * theta_acc * costheta / TOTAL_MASS
    x = s.x + TAU * s.x_dot
    x_dot = s.x_dot + TAU * x_acc
    theta = s.theta + TAU * s.theta_dot
    theta_dot = s.theta_dot + TAU * theta_acc
    t = s.t + 1
    s2 = CartPoleState(x, x_dot, theta, theta_dot, t)
    terminated = jnp.logical_or(
        jnp.abs(x) > X_THRESHOLD, jnp.abs(theta) > THETA_THRESHOLD
    )
    truncated = jnp.logical_and(t >= HORIZON, jnp.logical_not(terminated))
    return s2, _obs(s2), jnp.ones(()), terminated, truncated


@register("cartpole")
def make_cartpole() -> Env:
    spec = EnvSpec(
        name="cartpole",
        obs_dim=4,
        action_dim=2,  # number of discrete actions
        horizon=HORIZON,
        gamma=0.99,
        discrete=True,
    )
    return Env(spec=spec, reset=_reset, step=_step)
