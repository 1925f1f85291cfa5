"""Two-link planar reacher: multi-dimensional continuous control.

In-repo task (not a MuJoCo port) filling the "HalfCheetah-class continuous
control" configuration of BASELINE.json: action_dim > 1, smooth multi-joint
dynamics, dense shaped reward — the regime where the MLP is 2x256 and
thousands of vectorized instances feed a data-parallel learner.  The
reference framework caps out at BipedalWalker via the Gymnasium bridge
(scripts/gym_env.py:15-16, no results claimed); this env provides the same
class of workload fully on-device.

Physics: torque-controlled double integrator per joint with viscous damping
(explicit Euler, dt=0.05), fingertip must reach a random target sampled in
the reachable annulus.  Episodes are fixed-horizon (truncation only).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .core import Env, EnvSpec, register

L1 = 0.5          # link lengths
L2 = 0.5
DT = 0.05
DAMPING = 0.5
ACCEL_GAIN = 8.0  # torque-to-acceleration scale
MAX_TORQUE = 1.0
MAX_SPEED = 4.0
HORIZON = 150
OBS_DIM = 10      # cos/sin q1 q2, qd1 qd2, target xy, fingertip-target delta
ACT_DIM = 2


class ReacherState(NamedTuple):
    q: jax.Array        # [2] joint angles
    qd: jax.Array       # [2] joint velocities
    target: jax.Array   # [2] target xy
    t: jax.Array        # i32 steps


def _fingertip(q: jax.Array) -> jax.Array:
    x = L1 * jnp.cos(q[0]) + L2 * jnp.cos(q[0] + q[1])
    y = L1 * jnp.sin(q[0]) + L2 * jnp.sin(q[0] + q[1])
    return jnp.stack([x, y])


def _obs(s: ReacherState) -> jax.Array:
    tip = _fingertip(s.q)
    return jnp.concatenate([
        jnp.cos(s.q), jnp.sin(s.q), s.qd / MAX_SPEED, s.target, tip - s.target
    ])


def _reset(key: jax.Array):
    kq, kr, ka = jax.random.split(key, 3)
    q = jax.random.uniform(kq, (2,), minval=-jnp.pi, maxval=jnp.pi)
    # target uniformly in the reachable annulus, away from the degenerate rim
    radius = jax.random.uniform(kr, (), minval=0.1, maxval=0.9 * (L1 + L2))
    angle = jax.random.uniform(ka, (), minval=-jnp.pi, maxval=jnp.pi)
    target = radius * jnp.stack([jnp.cos(angle), jnp.sin(angle)])
    s = ReacherState(q, jnp.zeros((2,)), target, jnp.zeros((), jnp.int32))
    return s, _obs(s)


def _step(s: ReacherState, action: jax.Array, key: jax.Array):
    del key
    u = jnp.clip(action, -MAX_TORQUE, MAX_TORQUE)
    qdd = ACCEL_GAIN * u - DAMPING * s.qd
    qd = jnp.clip(s.qd + qdd * DT, -MAX_SPEED, MAX_SPEED)
    q = s.q + qd * DT
    t = s.t + 1
    s2 = ReacherState(q, qd, s.target, t)
    dist = jnp.linalg.norm(_fingertip(q) - s.target)
    reward = -dist - 0.01 * jnp.sum(jnp.square(u))
    terminated = jnp.zeros((), bool)
    truncated = t >= HORIZON
    return s2, _obs(s2), reward, terminated, truncated


@register("reacher")
def make_reacher() -> Env:
    spec = EnvSpec(
        name="reacher",
        obs_dim=OBS_DIM,
        action_dim=ACT_DIM,
        horizon=HORIZON,
        gamma=0.99,
        action_low=-MAX_TORQUE,
        action_high=MAX_TORQUE,
    )
    return Env(spec=spec, reset=_reset, step=_step)
