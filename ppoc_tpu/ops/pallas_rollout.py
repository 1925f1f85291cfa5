"""Whole-rollout Pallas kernel: the entire T-step actor loop as ONE program.

On this chip a compiled `lax.scan` iteration costs ~10 us of loop overhead
regardless of body size — a 200-step rollout pays ~2 ms before doing any
work, and the per-step policy/env kernels add fusion-boundary cost on top
(measured: 5.4 ms at the bench config, of which <1.5 ms is real compute).
This kernel runs the ENTIRE rollout — policy forward, Gaussian (Box-Muller,
the reference's generate_gaussian_noise src/policy.cu:46-65 reborn in
hardware) or categorical (Gumbel-max) sampling, env physics, horizon
truncation and auto-reset — inside one kernel: T iterations of
VMEM-resident VPU/MXU work with zero kernel boundaries.

Layout: features on sublanes, environments on lanes ([d, E] activations),
so the policy matmuls are [H, d] x [d, E] MXU contractions and every
physics quantity is a [1, E] lane vector.

Every in-repo environment is supported through the :data:`LANE_ENVS`
registry — each entry re-expresses its env's reset/step/obs (the SAME
equations as envs/<name>.py, cross-checked in tests/test_pallas_rollout.py)
as functions on [1, E] lane rows, so one generic kernel serves all of them.

RNG: a counter-based software generator (murmur3 finalizer over
(seed, step, draw, lane) counters) computed on the VPU — identical on TPU
and in CPU interpret mode, deterministic per trainer key.  The random
STREAM differs from jax.random (as the reference's libc rand() differs
from both); distributions are preserved and stored log-probs are
self-consistent, which is all PPO needs.
"""
from __future__ import annotations

import functools
import math
from typing import Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppoc_tpu.ops import vmem

_TWO_PI = 2.0 * math.pi


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# counter-based RNG (VPU-only; same bits on every backend)
# ---------------------------------------------------------------------------

def _fmix32(z):
    """murmur3 finalizer: full-avalanche 32-bit mixer (uint32 in/out)."""
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ (z >> 13)
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> 16)
    return z


def _uniform01(shape, s0, s1, t, draw: int, lane_off=0):
    """U[0,1) from counters (seed, step t, draw index, GLOBAL lane) — 24-bit
    mantissa construction; runs on the VPU, identical on all backends.
    ``lane_off`` globalizes the lane counter under the env-chunked grid so a
    chunked rollout draws the same stream as the single-shot kernel."""
    lane = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    if not (isinstance(lane_off, int) and lane_off == 0):
        # lane_off may be a traced program_id expression — asarray, not the
        # numpy scalar constructor (which would force concretization)
        lane = lane + jnp.asarray(lane_off, jnp.uint32)
    x = (s0
         + t.astype(jnp.uint32) * jnp.uint32(0x632BE59B)
         + jnp.uint32(draw) * jnp.uint32(0x9E3779B9)
         + (lane ^ s1) * jnp.uint32(0x2545F491))
    bits = _fmix32(x)
    # uint32 -> f32 is not a supported Mosaic cast; the >>8 value fits in
    # 24 bits so the int32 route is exact
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))


# ---------------------------------------------------------------------------
# lane-physics registry: each env as functions on [1, E] rows
# ---------------------------------------------------------------------------

Rows = List[jax.Array]  # state as a list of [1, E] f32 rows


class LaneEnv(NamedTuple):
    state_dim: int
    obs_dim: int
    act_dim: int            # continuous action rows (0 if discrete)
    n_actions: int          # discrete class count (0 if continuous)
    horizon: int
    reset: Callable         # rand(j) -> [1,E] uniform; returns state Rows
    obs: Callable           # Rows -> obs Rows
    step: Callable          # (Rows, act Rows) -> (Rows, reward, term) rows
    pack: Callable          # vmapped env state pytree -> ([E,state_dim], steps [E])
    unpack: Callable        # ([E,state_dim], steps [E]) -> state pytree


def _pendulum_lane() -> LaneEnv:
    from ppoc_tpu.envs.pendulum import (
        DT, G, HORIZON, L, M, MAX_SPEED, MAX_TORQUE, PendulumState,
    )

    def reset(rand):
        return [-math.pi + _TWO_PI * rand(0), -1.0 + 2.0 * rand(1)]

    def obs(s):
        th, thd = s
        return [jnp.cos(th), jnp.sin(th), thd]

    def step(s, act):
        th, thd = s
        u = jnp.clip(act[0], -MAX_TORQUE, MAX_TORQUE)
        v = th + math.pi
        an = v - _TWO_PI * jnp.floor(v / _TWO_PI) - math.pi
        cost = an * an + 0.1 * thd * thd + 0.001 * u * u
        thd2 = jnp.clip(
            thd + (3.0 * G / (2.0 * L) * jnp.sin(th) + 3.0 / (M * L * L) * u) * DT,
            -MAX_SPEED, MAX_SPEED,
        )
        th2 = th + thd2 * DT
        return [th2, thd2], -cost, jnp.zeros_like(th)

    return LaneEnv(
        2, 3, 1, 0, HORIZON, reset, obs, step,
        pack=lambda st: (jnp.stack([st.theta, st.theta_dot], 1), st.t),
        unpack=lambda m, t: PendulumState(m[:, 0], m[:, 1], t),
    )


def _simple_lane() -> LaneEnv:
    from ppoc_tpu.envs.simple import HORIZON, SimpleState

    def reset(rand):
        return [jnp.zeros_like(rand(0))]

    def obs(s):
        return [s[0]]

    def step(s, act):
        x = s[0] + jnp.clip(act[0], -1.0, 1.0)
        term = (x >= 5.0).astype(jnp.float32)
        return [x], term, term  # reward == 1 iff terminated

    return LaneEnv(
        1, 1, 1, 0, HORIZON, reset, obs, step,
        pack=lambda st: (st.s[:, None], st.t),
        unpack=lambda m, t: SimpleState(m[:, 0], t),
    )


def _cartpole_lane() -> LaneEnv:
    from ppoc_tpu.envs.cartpole import (
        FORCE_MAG, GRAVITY, HORIZON, LENGTH, MASSPOLE, POLEMASS_LENGTH,
        TAU, THETA_THRESHOLD, TOTAL_MASS, X_THRESHOLD, CartPoleState,
    )
    theta_lim = float(THETA_THRESHOLD)

    def reset(rand):
        return [-0.05 + 0.1 * rand(j) for j in range(4)]

    def obs(s):
        return list(s)

    def step(s, act):
        x, xd, th, thd = s
        force = jnp.where(act[0] > 0.5, FORCE_MAG, -FORCE_MAG)
        c, si = jnp.cos(th), jnp.sin(th)
        temp = (force + POLEMASS_LENGTH * thd * thd * si) / TOTAL_MASS
        th_acc = (GRAVITY * si - c * temp) / (
            LENGTH * (4.0 / 3.0 - MASSPOLE * c * c / TOTAL_MASS)
        )
        x_acc = temp - POLEMASS_LENGTH * th_acc * c / TOTAL_MASS
        x2 = x + TAU * xd
        xd2 = xd + TAU * x_acc
        th2 = th + TAU * thd
        thd2 = thd + TAU * th_acc
        term = jnp.maximum(
            (jnp.abs(x2) > X_THRESHOLD).astype(jnp.float32),
            (jnp.abs(th2) > theta_lim).astype(jnp.float32),
        )
        return [x2, xd2, th2, thd2], jnp.ones_like(x2), term

    return LaneEnv(
        4, 4, 0, 2, HORIZON, reset, obs, step,
        pack=lambda st: (jnp.stack([st.x, st.x_dot, st.theta, st.theta_dot], 1), st.t),
        unpack=lambda m, t: CartPoleState(m[:, 0], m[:, 1], m[:, 2], m[:, 3], t),
    )


def _mountain_car_lane(norm: bool) -> LaneEnv:
    from ppoc_tpu.envs.mountain_car import (
        GOAL_POSITION, GOAL_VELOCITY, HORIZON, MAX_POSITION, MAX_SPEED,
        MIN_POSITION, POWER, MountainCarState,
    )
    mid_p = (MAX_POSITION + MIN_POSITION) / 2.0
    half_p = (MAX_POSITION - MIN_POSITION) / 2.0

    def reset(rand):
        return [-0.6 + 0.2 * rand(0), jnp.zeros_like(rand(0))]

    def obs(s):
        pos, vel = s
        if norm:
            return [(pos - mid_p) / half_p, vel / MAX_SPEED]
        return [pos, vel]

    def step(s, act):
        pos, vel = s
        force = jnp.clip(act[0], -1.0, 1.0)
        vel2 = jnp.clip(vel + force * POWER - 0.0025 * jnp.cos(3.0 * pos),
                        -MAX_SPEED, MAX_SPEED)
        pos2 = jnp.clip(pos + vel2, MIN_POSITION, MAX_POSITION)
        vel2 = jnp.where(
            jnp.logical_and(pos2 <= MIN_POSITION, vel2 < 0.0), 0.0, vel2)
        term = jnp.logical_and(pos2 >= GOAL_POSITION,
                               vel2 >= GOAL_VELOCITY).astype(jnp.float32)
        reward = term * 100.0 - 0.1 * act[0] * act[0]
        return [pos2, vel2], reward, term

    return LaneEnv(
        2, 2, 1, 0, HORIZON, reset, obs, step,
        pack=lambda st: (jnp.stack([st.position, st.velocity], 1), st.t),
        unpack=lambda m, t: MountainCarState(m[:, 0], m[:, 1], t),
    )


def _acrobot_lane() -> LaneEnv:
    from ppoc_tpu.envs import acrobot as ac

    DT = ac.DT
    mv1, mv2 = float(ac.MAX_VEL_1), float(ac.MAX_VEL_2)

    def dsdt(th1, th2, d1_, d2_, torque):
        m1 = m2 = 1.0
        l1 = 1.0
        lc1 = lc2 = 0.5
        i1 = i2 = 1.0
        g = 9.8
        c2 = jnp.cos(th2)
        s2 = jnp.sin(th2)
        d1 = m1 * lc1 ** 2 + m2 * (l1 ** 2 + lc2 ** 2 + 2 * l1 * lc2 * c2) + i1 + i2
        d2 = m2 * (lc2 ** 2 + l1 * lc2 * c2) + i2
        phi2 = m2 * lc2 * g * jnp.cos(th1 + th2 - math.pi / 2.0)
        phi1 = (-m2 * l1 * lc2 * d2_ ** 2 * s2
                - 2 * m2 * l1 * lc2 * d2_ * d1_ * s2
                + (m1 * lc1 + m2 * l1) * g * jnp.cos(th1 - math.pi / 2.0)
                + phi2)
        dd2 = (torque + d2 / d1 * phi1 - m2 * l1 * lc2 * d1_ ** 2 * s2 - phi2) / (
            m2 * lc2 ** 2 + i2 - d2 ** 2 / d1)
        dd1 = -(d2 * dd2 + phi1) / d1
        return d1_, d2_, dd1, dd2

    def wrap(x):
        v = x + math.pi
        return v - _TWO_PI * jnp.floor(v / _TWO_PI) - math.pi

    def reset(rand):
        return [-0.1 + 0.2 * rand(j) for j in range(4)]

    def obs(s):
        th1, th2, d1_, d2_ = s
        return [jnp.cos(th1), jnp.sin(th1), jnp.cos(th2), jnp.sin(th2),
                d1_, d2_]

    def step(s, act):
        th1, th2, d1_, d2_ = s
        torque = act[0] - 1.0                      # class index {0,1,2}
        y = (th1, th2, d1_, d2_)
        k1 = dsdt(*y, torque)
        y2 = tuple(a + DT / 2.0 * b for a, b in zip(y, k1))
        k2 = dsdt(*y2, torque)
        y3 = tuple(a + DT / 2.0 * b for a, b in zip(y, k2))
        k3 = dsdt(*y3, torque)
        y4 = tuple(a + DT * b for a, b in zip(y, k3))
        k4 = dsdt(*y4, torque)
        out = [a + DT / 6.0 * (p + 2 * q + 2 * r_ + w)
               for a, p, q, r_, w in zip(y, k1, k2, k3, k4)]
        out[0] = wrap(out[0])
        out[1] = wrap(out[1])
        out[2] = jnp.clip(out[2], -mv1, mv1)
        out[3] = jnp.clip(out[3], -mv2, mv2)
        term = ((-jnp.cos(out[0]) - jnp.cos(out[1] + out[0])) > 1.0
                ).astype(jnp.float32)
        reward = term - 1.0                        # 0 on terminate, else -1
        return out, reward, term

    return LaneEnv(
        4, 6, 0, 3, ac.HORIZON, reset, obs, step,
        pack=lambda st: (st.s, st.t),
        unpack=lambda m, t: ac.AcrobotState(m, t),
    )


def _reacher_lane() -> LaneEnv:
    from ppoc_tpu.envs import reacher as rc

    def tip(q1, q2):
        return (rc.L1 * jnp.cos(q1) + rc.L2 * jnp.cos(q1 + q2),
                rc.L1 * jnp.sin(q1) + rc.L2 * jnp.sin(q1 + q2))

    def reset(rand):
        q1 = -math.pi + _TWO_PI * rand(0)
        q2 = -math.pi + _TWO_PI * rand(1)
        radius = 0.1 + (0.9 * (rc.L1 + rc.L2) - 0.1) * rand(2)
        angle = -math.pi + _TWO_PI * rand(3)
        z = jnp.zeros_like(q1)
        return [q1, q2, z, z,
                radius * jnp.cos(angle), radius * jnp.sin(angle)]

    def obs(s):
        q1, q2, qd1, qd2, tx, ty = s
        tx_, ty_ = tip(q1, q2)
        return [jnp.cos(q1), jnp.cos(q2), jnp.sin(q1), jnp.sin(q2),
                qd1 / rc.MAX_SPEED, qd2 / rc.MAX_SPEED, tx, ty,
                tx_ - tx, ty_ - ty]

    def step(s, act):
        q1, q2, qd1, qd2, tx, ty = s
        u1 = jnp.clip(act[0], -rc.MAX_TORQUE, rc.MAX_TORQUE)
        u2 = jnp.clip(act[1], -rc.MAX_TORQUE, rc.MAX_TORQUE)
        qd1n = jnp.clip(qd1 + (rc.ACCEL_GAIN * u1 - rc.DAMPING * qd1) * rc.DT,
                        -rc.MAX_SPEED, rc.MAX_SPEED)
        qd2n = jnp.clip(qd2 + (rc.ACCEL_GAIN * u2 - rc.DAMPING * qd2) * rc.DT,
                        -rc.MAX_SPEED, rc.MAX_SPEED)
        q1n = q1 + qd1n * rc.DT
        q2n = q2 + qd2n * rc.DT
        tx_, ty_ = tip(q1n, q2n)
        dist = jnp.sqrt(jnp.square(tx_ - tx) + jnp.square(ty_ - ty))
        reward = -dist - 0.01 * (u1 * u1 + u2 * u2)
        return [q1n, q2n, qd1n, qd2n, tx, ty], reward, jnp.zeros_like(q1)

    return LaneEnv(
        6, 10, 2, 0, rc.HORIZON, reset, obs, step,
        pack=lambda st: (jnp.concatenate([st.q, st.qd, st.target], 1), st.t),
        unpack=lambda m, t: rc.ReacherState(m[:, 0:2], m[:, 2:4], m[:, 4:6], t),
    )


LANE_ENVS = {
    "pendulum": _pendulum_lane,
    "simple": _simple_lane,
    "cartpole": _cartpole_lane,
    "mountain_car": functools.partial(_mountain_car_lane, False),
    "mountain_car_norm": functools.partial(_mountain_car_lane, True),
    "acrobot": _acrobot_lane,
    "reacher": _reacher_lane,
}

SUPPORTED = frozenset(LANE_ENVS)

# The kernel keeps every [T, E-chunk] output plane VMEM-resident for the
# whole rollout; past this per-cell total the Mosaic scoped-VMEM limit
# trips at compile time.  Shapes whose full [T, E] planes exceed the budget
# are CHUNKED over envs instead of falling back: the grid runs one cell per
# aligned env slice (each cell = the full T-step loop on E/C lanes), so
# e.g. reacher at 4096x150 (64 MB of planes) runs as 4 cells of 16 MB.
# Only shapes that cannot be split into 128-aligned chunks fall back to the
# XLA scan.  Empirical on v5e: 18.4 MB of planes compiles and runs single-
# shot (no grid, no block streaming), but GRID cells are DOUBLE-BUFFERED —
# a 13.5 MB/cell plan allocated 31 MB of scoped VMEM and tripped the 16 MB
# limit — so chunked cells get at most 8 MB of planes (~16 MB pipelined).
_SINGLE_VMEM_BUDGET = 24 * 1024 * 1024
_CHUNK_VMEM_BUDGET = 8 * 1024 * 1024

# The budgets above exceed Mosaic's DEFAULT 16 MB scoped-VMEM cap, which is
# a compile-time allocator limit, not the hardware (v5e VMEM is 128 MB).
# Round 3 compiled these shapes against a terminal whose effective cap was
# higher; the cap must therefore be pinned HERE, not inherited from the
# environment (same lesson as ops/pallas_attn._PARAMS).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024)


def _plane_count(lane: LaneEnv, with_v: bool) -> int:
    na = 1 if lane.n_actions > 0 else lane.act_dim
    planes = 2 * lane.obs_dim + na + 4     # obs, next_obs, a..., lp/r/te/tr
    if with_v:
        planes += 2                        # V(s), V(s') planes
    return planes


def chunk_plan(env_name: str, T: int, E: int,
               with_v: bool = False) -> Optional[int]:
    """Number of env chunks (grid cells) the kernel needs for this shape,
    or None when no 128-lane-aligned chunking fits the per-cell budget."""
    lane = LANE_ENVS[env_name]()
    per_env = 4 * _plane_count(lane, with_v) * T
    if per_env * E <= _SINGLE_VMEM_BUDGET:
        return 1
    return vmem.search_chunks(E, lambda Ec: per_env * Ec <= _CHUNK_VMEM_BUDGET)


def fits_vmem(env_name: str, T: int, E: int, with_v: bool = False) -> bool:
    """True when the whole-rollout kernel can serve this shape (single-shot
    or env-chunked)."""
    return chunk_plan(env_name, T, E, with_v) is not None


# ---------------------------------------------------------------------------
# the generic kernel
# ---------------------------------------------------------------------------

def _kernel(T: int, E: int, C: int, n_layers: int, n_v_layers: int,
            activation: str, fresh: bool, gamma: float, lane: LaneEnv,
            seed_ref, ls_ref, *refs):
    """Grid cell body.  ``E`` is the CHUNK width (lanes per cell); with
    ``C`` > 1 cells the grid covers C * E envs, each cell running the full
    T-step loop on its slice, RNG lanes globalized by the cell offset."""
    par = refs[: 2 * n_layers]
    vpar = refs[2 * n_layers: 2 * (n_layers + n_v_layers)]
    base = 2 * (n_layers + n_v_layers)
    st0_ref = refs[base]                  # [state_dim, E]
    steps0_ref = refs[base + 1]           # [1, E]
    out = refs[base + 2:]
    D, O = lane.state_dim, lane.obs_dim
    na = 1 if lane.n_actions > 0 else lane.act_dim
    obs_refs = out[:O]
    nobs_refs = out[O: 2 * O]
    a_refs = out[2 * O: 2 * O + na]       # one [T, E] plane per action dim
    b2 = 2 * O + na
    lp_ref, r_ref, te_ref, tr_ref = out[b2: b2 + 4]
    stf_ref = out[b2 + 4]                 # [state_dim, E] final carry
    stepsf_ref = out[b2 + 5]              # [1, E]
    # eval-metric accumulators, one lane row each: completed-episode sums
    # of undiscounted R / discounted J and the episode count — the in-kernel
    # twin of algo.ppo.eval_metrics_from_traj (completed episodes only)
    mR_ref, mJ_ref, mN_ref = out[b2 + 6: b2 + 9]
    # per-lane running accumulators live in scratch-free rows of the refs:
    # r_acc / j_acc / gamma^t within the current episode
    racc_ref, jacc_ref, gpow_ref = out[b2 + 9: b2 + 12]
    # optional fused value-net planes: V(s_t) / V(s'_t) — per-step cost is
    # sequencing-bound, so these two extra tiny forwards ride ~free and the
    # GAE phase loses its two whole-buffer XLA forwards (docs/RESULTS.md)
    with_v = n_v_layers > 0
    if with_v:
        v_ref, nv_ref = out[b2 + 12: b2 + 14]
    # globalize the RNG lane counter: cell c covers lanes [c*E, (c+1)*E)
    off = 0 if C == 1 else pl.program_id(0) * E
    rng = functools.partial(_uniform01, lane_off=off)

    def fwd(h, pars, nl):
        for l in range(nl):
            w = pars[2 * l][:]
            b = pars[2 * l + 1][:]
            h = jax.lax.dot_general(
                w, h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b
            if l < nl - 1:
                if activation == "relu":
                    h = jnp.maximum(h, 0.0)
                elif activation == "tanh":
                    h = jnp.tanh(h)
        return h

    s0 = seed_ref[0, 0].astype(jnp.uint32)
    s1 = seed_ref[0, 1].astype(jnp.uint32)
    K = lane.n_actions
    discrete = K > 0

    if fresh:
        t_init = jnp.uint32(0xFFFF0000)
        rows = lane.reset(lambda j: rng((1, E), s0, s1, t_init, 50 + j))
        for d in range(D):
            stf_ref[d: d + 1, :] = rows[d]
        stepsf_ref[:] = jnp.zeros((1, E), jnp.float32)
    else:
        stf_ref[:] = st0_ref[:]
        stepsf_ref[:] = steps0_ref[:]
    zero = jnp.zeros((1, E), jnp.float32)
    mR_ref[:] = zero
    mJ_ref[:] = zero
    mN_ref[:] = zero
    racc_ref[:] = zero
    jacc_ref[:] = zero
    gpow_ref[:] = jnp.ones((1, E), jnp.float32)

    def body(t, _):
        st = stf_ref[:]
        rows = [st[d: d + 1, :] for d in range(D)]
        steps = stepsf_ref[:]

        ob = lane.obs(rows)
        for d in range(O):
            obs_refs[d][pl.ds(t, 1), :] = ob[d]

        # policy forward: [H, d] x [d, E]
        h_in = jnp.concatenate(ob, axis=0)
        h = fwd(h_in, par, n_layers)
        if with_v:
            v_ref[pl.ds(t, 1), :] = fwd(h_in, vpar, n_v_layers)

        if discrete:
            # Gumbel-max sampling over K logit rows + exact log-softmax
            zmax = h[0:1, :]
            for k in range(1, K):
                zmax = jnp.maximum(zmax, h[k: k + 1, :])
            lse = jnp.zeros((1, E), jnp.float32)
            for k in range(K):
                lse = lse + jnp.exp(h[k: k + 1, :] - zmax)
            lse = zmax + jnp.log(lse)
            best_val = None
            best_idx = None
            for k in range(K):
                u = jnp.clip(rng((1, E), s0, s1, t, k),
                             1e-12, 1.0 - 1e-7)
                y = h[k: k + 1, :] - jnp.log(-jnp.log(u))
                if best_val is None:
                    best_val, best_idx = y, jnp.zeros((1, E), jnp.float32)
                else:
                    take = y > best_val
                    best_val = jnp.where(take, y, best_val)
                    best_idx = jnp.where(take, float(k), best_idx)
            a_rows = [best_idx]
            lp = jnp.zeros((1, E), jnp.float32)
            for k in range(K):
                lp = lp + jnp.where(best_idx == float(k),
                                    h[k: k + 1, :] - lse, 0.0)
        else:
            a_rows = []
            lp = jnp.full((1, E), -0.5 * lane.act_dim * math.log(_TWO_PI))
            for j in range(lane.act_dim):
                ls = ls_ref[j, 0]
                sigma = jnp.exp(ls)
                u1 = jnp.maximum(rng((1, E), s0, s1, t, 2 * j), 1e-12)
                u2 = rng((1, E), s0, s1, t, 2 * j + 1)
                eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
                mu = h[j: j + 1, :]
                a = mu + eps * sigma
                z = (a - mu) / sigma
                lp = lp - ls - 0.5 * z * z
                a_rows.append(a)

        # one [T, E] action plane per dim (keeps blocks contiguous when the
        # grid chunks over envs)
        for j, a in enumerate(a_rows):
            a_refs[j][pl.ds(t, 1), :] = a
        lp_ref[pl.ds(t, 1), :] = lp

        new_rows, reward, term = lane.step(rows, a_rows)
        steps2 = steps + 1.0
        trunc = jnp.maximum(
            (steps2 >= lane.horizon).astype(jnp.float32) - term, 0.0)

        nob = lane.obs(new_rows)
        for d in range(O):
            nobs_refs[d][pl.ds(t, 1), :] = nob[d]
        if with_v:
            nv_ref[pl.ds(t, 1), :] = fwd(jnp.concatenate(nob, axis=0),
                                         vpar, n_v_layers)
        r_ref[pl.ds(t, 1), :] = reward
        te_ref[pl.ds(t, 1), :] = term
        tr_ref[pl.ds(t, 1), :] = trunc

        done = jnp.maximum(term, trunc)

        # eval metrics: bank completed episodes, reset within-episode sums
        racc2 = racc_ref[:] + reward
        jacc2 = jacc_ref[:] + gpow_ref[:] * reward
        mR_ref[:] += done * racc2
        mJ_ref[:] += done * jacc2
        mN_ref[:] += done
        racc_ref[:] = (1.0 - done) * racc2
        jacc_ref[:] = (1.0 - done) * jacc2
        gpow_ref[:] = jnp.where(done > 0, 1.0, gpow_ref[:] * gamma)

        fresh_rows = lane.reset(
            lambda j: rng((1, E), s0, s1, t, 50 + j))
        for d in range(D):
            stf_ref[d: d + 1, :] = jnp.where(done > 0, fresh_rows[d],
                                             new_rows[d])
        stepsf_ref[:] = jnp.where(done > 0, 0.0, steps2)
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def rollout_fused(
    env_name: str,
    policy_params,
    key: jax.Array,
    n_envs: int,
    length: int,
    activation: str = "relu",
    env_carry: Optional[Tuple] = None,
    gamma: float = 0.99,
    return_metrics: bool = False,
    v_params=None,
    n_chunks: Optional[int] = None,
):
    """One-kernel rollout for any registered env; returns (Transition,
    env_carry) with the same structure as the scan path (algo/ppo.py).

    With ``return_metrics=True`` additionally returns
    ``(sum_R, sum_J, n_episodes)`` over COMPLETED episodes, accumulated
    in-kernel — the evaluator needs no post-processing scans.

    With ``v_params`` (an mlp.init params list) additionally returns
    ``(values, next_values)`` [T, E] planes — the value net evaluated
    in-kernel on every stored obs/next_obs, replacing the GAE phase's two
    whole-buffer forwards (compute_gae_cuda's, src/ppo.cu:267-274).

    ``n_chunks`` overrides the VMEM planner (:func:`chunk_plan`): the grid
    runs that many cells, each covering an aligned slice of
    ``n_envs / n_chunks`` lanes for the full T-step loop.  RNG lane
    counters are global, so any chunking produces BIT-IDENTICAL output."""
    from ppoc_tpu.algo.ppo import Transition

    if return_metrics and v_params is not None:
        raise ValueError("return_metrics and v_params are mutually exclusive")
    lane = LANE_ENVS[env_name]()
    params = policy_params["mlp"]
    discrete = lane.n_actions > 0
    log_std = (jnp.zeros((1,), jnp.float32) if discrete
               else policy_params["log_std"])
    n_layers = len(params)
    T, E = length, n_envs
    D, O = lane.state_dim, lane.obs_dim
    act_dim = 1 if discrete else lane.act_dim
    C = (chunk_plan(env_name, T, E, with_v=v_params is not None)
         if n_chunks is None else n_chunks)
    if C is None or E % C != 0:
        raise ValueError(
            f"no valid env chunking for {env_name} at T={T}, E={E} "
            f"(n_chunks={n_chunks}); caller should gate on fits_vmem()")
    Ec = E // C

    kd = jax.random.fold_in(key, 0)
    try:
        if jnp.issubdtype(kd.dtype, jax.dtypes.prng_key):
            kd = jax.random.key_data(kd)
    except (AttributeError, TypeError):
        pass
    seed_arr = (jnp.asarray(kd, jnp.uint32).reshape(-1)[:2]
                .astype(jnp.int32).reshape(1, 2))

    fresh = env_carry is None
    if fresh:
        st0 = jnp.zeros((D, E), jnp.float32)
        steps0 = jnp.zeros((1, E), jnp.float32)
    else:
        state, _obs0 = env_carry
        mat, steps = lane.pack(state)
        st0 = mat.T.astype(jnp.float32)
        steps0 = steps.astype(jnp.float32).reshape(1, E)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if C == 1:
        # single-shot: whole arrays in VMEM, no grid (any E works, even
        # non-128-aligned — Mosaic pads full-array refs itself)
        full, sliced_mat, sliced_row, sliced_plane = vmem, vmem, vmem, vmem
        grid = ()
    else:
        # env-chunked: C grid cells, each streaming an aligned [., Ec]
        # block of every per-env array; params/seed replicated per cell
        full = vmem
        sliced_mat = pl.BlockSpec((D, Ec), lambda c: (0, c))
        sliced_row = pl.BlockSpec((1, Ec), lambda c: (0, c))
        sliced_plane = pl.BlockSpec((T, Ec), lambda c: (0, c))
        grid = (C,)
    inputs = [seed_arr, log_std.reshape(-1, 1)]
    in_specs = [smem, full]
    for w, b in params:
        inputs += [w, b.reshape(-1, 1)]
        in_specs += [full, full]
    n_v_layers = 0
    if v_params is not None:
        n_v_layers = len(v_params)
        for w, b in v_params:
            inputs += [w, b.reshape(-1, 1)]
            in_specs += [full, full]
    inputs += [st0, steps0]
    in_specs += [sliced_mat, sliced_row]

    plane = jax.ShapeDtypeStruct((T, E), jnp.float32)
    row = jax.ShapeDtypeStruct((1, E), jnp.float32)
    n_planes = 2 * O + act_dim + 4          # obs, nobs, a..., lp/r/te/tr
    out_shape = ([plane] * n_planes
                 + [jax.ShapeDtypeStruct((D, E), jnp.float32), row]
                 + [row] * 6)   # mR, mJ, mN, r_acc, j_acc, gamma^t
    out_specs = ([sliced_plane] * n_planes + [sliced_mat, sliced_row]
                 + [sliced_row] * 6)
    if v_params is not None:
        out_shape += [plane, plane]  # V(s), V(s')
        out_specs += [sliced_plane, sliced_plane]

    mlp_flops = 2 * E * sum(w.shape[0] * w.shape[1] for w, _ in params)
    if v_params is not None:
        mlp_flops += 4 * E * sum(w.shape[0] * w.shape[1] for w, _ in v_params)
    outs = pl.pallas_call(
        functools.partial(_kernel, T, Ec, C, n_layers, n_v_layers,
                          activation, fresh, gamma, lane),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=T * (mlp_flops + 60 * E),
            bytes_accessed=4 * (2 * O + 6) * T * E,
            transcendentals=12 * T * E,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*inputs)

    b2 = 2 * O + act_dim
    obs_planes = outs[:O]
    nobs_planes = outs[O: 2 * O]
    a_planes = outs[2 * O: b2]
    lp, r, te, tr = outs[b2: b2 + 4]
    stf, stepsf = outs[b2 + 4], outs[b2 + 5]
    mR, mJ, mN = outs[b2 + 6: b2 + 9]

    obs = jnp.stack(obs_planes, axis=-1)
    next_obs = jnp.stack(nobs_planes, axis=-1)
    if discrete:
        action = a_planes[0].reshape(T, E, 1).astype(jnp.int32)
    else:
        action = jnp.stack(a_planes, axis=-1)
    term = te > 0
    trunc = tr > 0
    traj = Transition(
        obs=obs, action=action, log_prob=lp, next_obs=next_obs,
        reward=r, terminated=term, truncated=trunc,
    )
    state = lane.unpack(stf.T, stepsf.reshape(E).astype(jnp.int32))
    obs_after_rows = lane.obs([stf[d: d + 1, :] for d in range(D)])
    obs_after = jnp.stack([x.reshape(E) for x in obs_after_rows], axis=-1)
    if return_metrics:
        return traj, (state, obs_after), (jnp.sum(mR), jnp.sum(mJ),
                                          jnp.sum(mN))
    if v_params is not None:
        v, nv = outs[b2 + 12], outs[b2 + 13]
        return traj, (state, obs_after), (v, nv)
    return traj, (state, obs_after)
