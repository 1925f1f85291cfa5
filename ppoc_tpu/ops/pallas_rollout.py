"""Whole-rollout Pallas kernel: the entire T-step actor loop as ONE program.

On this chip a compiled `lax.scan` iteration costs ~10 us of loop overhead
regardless of body size — a 200-step rollout pays ~2 ms before doing any
work, and the per-step policy/env kernels add fusion-boundary cost on top
(measured: 5.4 ms at the bench config, of which <1.5 ms is real compute).
This kernel runs the ENTIRE rollout — policy forward, Box-Muller Gaussian
sampling from the on-core PRNG (the reference's generate_gaussian_noise,
src/policy.cu:46-65, reborn in hardware), Pendulum physics
(envs/pendulum.py semantics exactly), horizon truncation and auto-reset —
inside one kernel: T iterations of VMEM-resident VPU/MXU work with zero
kernel boundaries.

Layout: features on sublanes, environments on lanes ([d, E] activations),
so the policy matmuls are [H, d] x [d, E] MXU contractions and every
physics quantity is a [1, E] lane vector.

RNG: a counter-based software generator (murmur3 finalizer over
(seed, step, draw, lane) counters) computed on the VPU — identical on TPU
and in CPU interpret mode, deterministic per trainer key.  The random
STREAM differs from jax.random (as the reference's libc rand() differs
from both); distributions are preserved and stored log-probs are
self-consistent, which is all PPO needs.

Pendulum-only (the flagship/headline env); other envs keep the scan path.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppoc_tpu.envs.pendulum import (
    DT, G, HORIZON, L, M, MAX_SPEED, MAX_TORQUE, PendulumState,
)

_TWO_PI = 2.0 * math.pi


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fmix32(z):
    """murmur3 finalizer: full-avalanche 32-bit mixer (uint32 in/out)."""
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ (z >> 13)
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> 16)
    return z


def _uniform01(shape, s0, s1, t, draw: int):
    """U[0,1) from counters (seed, step t, draw index, lane) — 24-bit
    mantissa construction; runs on the VPU, identical on all backends."""
    lane = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    x = (s0
         + t.astype(jnp.uint32) * jnp.uint32(0x632BE59B)
         + jnp.uint32(draw) * jnp.uint32(0x9E3779B9)
         + (lane ^ s1) * jnp.uint32(0x2545F491))
    bits = _fmix32(x)
    # uint32 -> f32 is not a supported Mosaic cast; the >>8 value fits in
    # 24 bits so the int32 route is exact
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))


def _angle_norm(x):
    v = x + math.pi
    v = v - _TWO_PI * jnp.floor(v / _TWO_PI)
    return v - math.pi


def _kernel(T: int, E: int, n_layers: int, activation: str, fresh_reset: bool,
            seed_ref, ls_ref, *refs):
    # refs: [W_l [d_in,d_out], b_l [d_out,1]] * n_layers, th0, thd0, st0
    # (each [1,E]), then outputs: cos,sin,thd planes (obs), next planes,
    # action, logp, reward, trunc (each [T,E]), th_f, thd_f, st_f [1,E].
    par = refs[: 2 * n_layers]
    th0_ref, thd0_ref, st0_ref = refs[2 * n_layers: 2 * n_layers + 3]
    (oc_ref, os_ref, od_ref, nc_ref, ns_ref, nd_ref, a_ref, lp_ref,
     r_ref, tr_ref, thf_ref, thdf_ref, stf_ref) = refs[2 * n_layers + 3:]

    s0 = seed_ref[0, 0].astype(jnp.uint32)
    s1 = seed_ref[0, 1].astype(jnp.uint32)
    t_init = jnp.uint32(0xFFFF0000)  # init draws use a reserved "step"

    if fresh_reset:
        th = -math.pi + _TWO_PI * _uniform01((1, E), s0, s1, t_init, 0)
        thd = -1.0 + 2.0 * _uniform01((1, E), s0, s1, t_init, 1)
        st = jnp.zeros((1, E), jnp.float32)
    else:
        th = th0_ref[:]
        thd = thd0_ref[:]
        st = st0_ref[:]

    ls = ls_ref[0, 0]
    sigma = jnp.exp(ls)

    thf_ref[:] = th
    thdf_ref[:] = thd
    stf_ref[:] = st

    def body(t, _):
        th = thf_ref[:]
        thd = thdf_ref[:]
        st = stf_ref[:]

        # observation the policy acts on
        c = jnp.cos(th)
        s = jnp.sin(th)
        oc_ref[pl.ds(t, 1), :] = c
        os_ref[pl.ds(t, 1), :] = s
        od_ref[pl.ds(t, 1), :] = thd

        # policy forward: [H, d] x [d, E] contractions
        h = jnp.concatenate([c, s, thd], axis=0)        # [3, E]
        for l in range(n_layers):
            w = par[2 * l][:]                           # [d_in, d_out]
            b = par[2 * l + 1][:]                       # [d_out, 1]
            h = jax.lax.dot_general(
                w, h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b
            if l < n_layers - 1:
                if activation == "relu":
                    h = jnp.maximum(h, 0.0)
                elif activation == "tanh":
                    h = jnp.tanh(h)
        mu = h                                          # [1, E]

        # Box-Muller sample (src/policy.cu:46-65)
        u1 = jnp.maximum(_uniform01((1, E), s0, s1, t, 2), 1e-12)
        u2 = _uniform01((1, E), s0, s1, t, 3)
        eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
        a = mu + eps * sigma
        z = (a - mu) / sigma
        lp = -0.5 * math.log(_TWO_PI) - ls - 0.5 * z * z
        a_ref[pl.ds(t, 1), :] = a
        lp_ref[pl.ds(t, 1), :] = lp

        # Pendulum physics (envs/pendulum.py:_step)
        u = jnp.clip(a, -MAX_TORQUE, MAX_TORQUE)
        an = _angle_norm(th)
        cost = an * an + 0.1 * thd * thd + 0.001 * u * u
        thd2 = jnp.clip(
            thd + (3.0 * G / (2.0 * L) * s + 3.0 / (M * L * L) * u) * DT,
            -MAX_SPEED, MAX_SPEED,
        )
        th2 = th + thd2 * DT
        st2 = st + 1.0
        trunc = (st2 >= HORIZON).astype(jnp.float32)

        nc_ref[pl.ds(t, 1), :] = jnp.cos(th2)
        ns_ref[pl.ds(t, 1), :] = jnp.sin(th2)
        nd_ref[pl.ds(t, 1), :] = thd2
        r_ref[pl.ds(t, 1), :] = -cost
        tr_ref[pl.ds(t, 1), :] = trunc

        # auto-reset the truncated lanes
        th_new = -math.pi + _TWO_PI * _uniform01((1, E), s0, s1, t, 4)
        thd_new = -1.0 + 2.0 * _uniform01((1, E), s0, s1, t, 5)
        thf_ref[:] = jnp.where(trunc > 0, th_new, th2)
        thdf_ref[:] = jnp.where(trunc > 0, thd_new, thd2)
        stf_ref[:] = jnp.where(trunc > 0, 0.0, st2)
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def rollout_pendulum(
    policy_params,
    key: jax.Array,
    n_envs: int,
    length: int,
    activation: str = "relu",
    env_carry: Optional[Tuple] = None,
):
    """One-kernel rollout; returns (Transition-field tuple, env_carry) with
    the same structure as the scan path (algo/ppo.py rollout)."""
    from ppoc_tpu.algo.ppo import Transition

    params = policy_params["mlp"]
    log_std = policy_params["log_std"]
    n_layers = len(params)
    T, E = length, n_envs

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
        th0 = jnp.zeros((1, E), jnp.float32)
        thd0 = jnp.zeros((1, E), jnp.float32)
        st0 = jnp.zeros((1, E), jnp.float32)
    else:
        state, _obs0 = env_carry
        th0 = state.theta.reshape(1, E)
        thd0 = state.theta_dot.reshape(1, E)
        st0 = state.t.astype(jnp.float32).reshape(1, E)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    inputs = [seed_arr, log_std.reshape(1, 1)]
    in_specs = [smem, vmem]
    for w, b in params:
        inputs += [w, b.reshape(-1, 1)]
        in_specs += [vmem, vmem]
    inputs += [th0, thd0, st0]
    in_specs += [vmem, vmem, vmem]

    plane = jax.ShapeDtypeStruct((T, E), jnp.float32)
    carry_row = jax.ShapeDtypeStruct((1, E), jnp.float32)
    out_shape = [plane] * 10 + [carry_row] * 3
    out_specs = [vmem] * 13

    outs = pl.pallas_call(
        functools.partial(_kernel, T, E, n_layers, activation, fresh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=T * 2 * E * sum(w.shape[0] * w.shape[1] for w, _ in params)
            + 40 * T * E,
            bytes_accessed=4 * (10 * T * E),
            transcendentals=8 * T * E,
        ),
        interpret=_interpret(),
    )(*inputs)

    oc, os_, od, nc, ns, nd, a, lp, r, tr, thf, thdf, stf = outs
    obs = jnp.stack([oc, os_, od], axis=-1)           # [T, E, 3]
    next_obs = jnp.stack([nc, ns, nd], axis=-1)
    trunc = tr > 0
    traj = Transition(
        obs=obs,
        action=a[..., None],
        log_prob=lp,
        next_obs=next_obs,
        reward=r,
        terminated=jnp.zeros_like(trunc),
        truncated=trunc,
    )
    state = PendulumState(
        theta=thf.reshape(E), theta_dot=thdf.reshape(E),
        t=stf.reshape(E).astype(jnp.int32),
    )
    obs_after = jnp.stack(
        [jnp.cos(state.theta), jnp.sin(state.theta), state.theta_dot], axis=-1
    )
    return traj, (state, obs_after)
