"""Acrobot-v1 dynamics as a pure-JAX environment (discrete actions).

Second discrete-action family beyond CartPole.  Physics are Gymnasium's
AcrobotEnv reproduced exactly — the book dynamics (Sutton & Barto) with the
``book`` convention, RK4 integration of the 4-state ODE, torque in
{-1, 0, +1}, both angular velocities clipped, terminate when
``-cos(th1) - cos(th2 + th1) > 1`` — so learning curves line up with the
Gymnasium bridge; cross-checked step-for-step in tests/test_envs.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .core import Env, EnvSpec, register

DT = 0.2
LINK_LENGTH_1 = 1.0
LINK_MASS_1 = 1.0
LINK_MASS_2 = 1.0
LINK_COM_POS_1 = 0.5
LINK_COM_POS_2 = 0.5
LINK_MOI = 1.0
MAX_VEL_1 = 4.0 * jnp.pi
MAX_VEL_2 = 9.0 * jnp.pi
G = 9.8
TORQUES = jnp.array([-1.0, 0.0, 1.0])
HORIZON = 500


class AcrobotState(NamedTuple):
    s: jax.Array  # [4]: theta1, theta2, dtheta1, dtheta2
    t: jax.Array  # i32 steps


def _dsdt(s_aug: jax.Array) -> jax.Array:
    """Gymnasium AcrobotEnv._dsdt with the 'book' convention."""
    m1, m2 = LINK_MASS_1, LINK_MASS_2
    l1 = LINK_LENGTH_1
    lc1, lc2 = LINK_COM_POS_1, LINK_COM_POS_2
    i1 = i2 = LINK_MOI
    a = s_aug[4]
    theta1, theta2, dtheta1, dtheta2 = s_aug[0], s_aug[1], s_aug[2], s_aug[3]
    d1 = (
        m1 * lc1 ** 2
        + m2 * (l1 ** 2 + lc2 ** 2 + 2 * l1 * lc2 * jnp.cos(theta2))
        + i1 + i2
    )
    d2 = m2 * (lc2 ** 2 + l1 * lc2 * jnp.cos(theta2)) + i2
    phi2 = m2 * lc2 * G * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
    phi1 = (
        -m2 * l1 * lc2 * dtheta2 ** 2 * jnp.sin(theta2)
        - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
        + (m1 * lc1 + m2 * l1) * G * jnp.cos(theta1 - jnp.pi / 2.0)
        + phi2
    )
    # 'book' convention (gymnasium acrobot.py, book_or_nips == "book")
    ddtheta2 = (
        a + d2 / d1 * phi1 - m2 * l1 * lc2 * dtheta1 ** 2 * jnp.sin(theta2) - phi2
    ) / (m2 * lc2 ** 2 + i2 - d2 ** 2 / d1)
    ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
    return jnp.array([dtheta1, dtheta2, ddtheta1, ddtheta2, 0.0])


def _rk4_step(s_aug: jax.Array, dt: float) -> jax.Array:
    """One RK4 step (gymnasium's rk4 helper with two time points [0, dt])."""
    k1 = _dsdt(s_aug)
    k2 = _dsdt(s_aug + dt / 2.0 * k1)
    k3 = _dsdt(s_aug + dt / 2.0 * k2)
    k4 = _dsdt(s_aug + dt * k3)
    return s_aug + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def _wrap(x, lo, hi):
    diff = hi - lo
    return ((x - lo) % diff) + lo


def _obs(st: AcrobotState) -> jax.Array:
    s = st.s
    return jnp.stack([
        jnp.cos(s[0]), jnp.sin(s[0]), jnp.cos(s[1]), jnp.sin(s[1]), s[2], s[3]
    ])


def _reset(key: jax.Array):
    s = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
    st = AcrobotState(s, jnp.zeros((), jnp.int32))
    return st, _obs(st)


def _step(st: AcrobotState, action: jax.Array, key: jax.Array):
    del key
    torque = TORQUES[action.reshape(()).astype(jnp.int32)]
    s_aug = jnp.concatenate([st.s, torque[None]])
    ns = _rk4_step(s_aug, DT)[:4]
    ns = ns.at[0].set(_wrap(ns[0], -jnp.pi, jnp.pi))
    ns = ns.at[1].set(_wrap(ns[1], -jnp.pi, jnp.pi))
    ns = ns.at[2].set(jnp.clip(ns[2], -MAX_VEL_1, MAX_VEL_1))
    ns = ns.at[3].set(jnp.clip(ns[3], -MAX_VEL_2, MAX_VEL_2))
    t = st.t + 1
    st2 = AcrobotState(ns, t)
    terminated = -jnp.cos(ns[0]) - jnp.cos(ns[1] + ns[0]) > 1.0
    truncated = jnp.logical_and(t >= HORIZON, jnp.logical_not(terminated))
    reward = jnp.where(terminated, 0.0, -1.0)
    return st2, _obs(st2), reward, terminated, truncated


@register("acrobot")
def make_acrobot() -> Env:
    spec = EnvSpec(
        name="acrobot",
        obs_dim=6,
        action_dim=3,  # number of discrete actions
        horizon=HORIZON,
        gamma=0.99,
        discrete=True,
    )
    return Env(spec=spec, reset=_reset, step=_step)
