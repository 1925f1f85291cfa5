"""Fused GAE + whole-buffer advantage normalization as one Pallas kernel.

The direct TPU descendant of the reference's GAE pipeline — delta kernel +
block-doubling scan + merge + Welford reduction + normalize kernel
(src/ppo.cu:171-259, 261-323 — five launches with HBM between each): here
the whole [T, E] problem sits in VMEM (51 KB at the bench config, 2.4 MB at
the largest) and ONE kernel computes deltas, runs the O(T) backward
recurrence vectorized across the E lanes on the VPU, reduces mean/variance
and writes the normalized advantages and value targets.

Where the jnp twin uses a log-depth ``associative_scan`` (whose ~log T
full-array passes cost more HBM traffic than the problem size justifies),
the sequential recurrence here is T tiny VPU steps on VMEM-resident rows —
the time axis is short (the env horizon), E is the vector width.

Numerics: recurrence identical to ops/gae.gae_reference; normalization uses
the population moments like ops/welford + gae.normalize (eps inside, 1e-8).
Single-device only (the dp path psums Welford triples across shards before
normalizing — that collective stays in XLA).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Empirical Mosaic scoped-VMEM ceiling on v5e: a [200, 4096] f32 plane
# (3.3 MB) compiles, [200, 8192] (6.6 MB) is rejected — the kernel keeps
# several [T, E] planes live at once. Callers should fall back to the XLA
# scan path beyond this.
_PLANE_BYTE_LIMIT = 4 * 1024 * 1024


def fits_vmem(T: int, E: int) -> bool:
    return 4 * T * E <= _PLANE_BYTE_LIMIT


def _kernel(gamma: float, lam: float, do_norm: bool, T: int,
            r_ref, v_ref, nv_ref, term_ref, done_ref, adv_ref, tgt_ref,
            scr_ref, coeff_ref):
    # deltas + coefficients (vectorized VPU passes) -> scratch refs; the
    # recurrence below indexes rows dynamically, which Pallas supports on
    # REFS but not on values
    scr_ref[:] = (r_ref[:] + gamma * nv_ref[:] * (1.0 - term_ref[:])
                  - v_ref[:])
    coeff_ref[:] = gamma * lam * (1.0 - done_ref[:])

    # backward-in-time linear recurrence, E lanes in parallel
    adv_ref[T - 1, :] = scr_ref[T - 1, :]

    def body(i, _):
        t = T - 2 - i
        adv_ref[t, :] = scr_ref[t, :] + coeff_ref[t, :] * adv_ref[t + 1, :]
        return 0

    jax.lax.fori_loop(0, T - 1, body, 0)

    tgt_ref[:] = v_ref[:] + adv_ref[:]

    if do_norm:
        n = adv_ref.shape[0] * adv_ref.shape[1]
        a = adv_ref[:]
        mean = jnp.sum(a) / n
        var = jnp.sum(jnp.square(a - mean)) / n
        adv_ref[:] = (a - mean) / (jnp.sqrt(var) + 1e-8)


def gae_norm_fused(
    rewards: jax.Array,      # [T, E]
    values: jax.Array,
    next_values: jax.Array,
    terminated: jax.Array,   # bool
    truncated: jax.Array,    # bool
    gamma: float,
    lam: float,
    normalize: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (advantages [normalized if requested], value targets)."""
    T = rewards.shape[0]
    term = terminated.astype(jnp.float32)
    done = jnp.logical_or(terminated, truncated).astype(jnp.float32)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    adv, tgt = pl.pallas_call(
        functools.partial(_kernel, gamma, lam, normalize, T),
        in_specs=[spec] * 5,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(rewards.shape, jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM(rewards.shape, jnp.float32),
                        pltpu.VMEM(rewards.shape, jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=12 * rewards.size,
            bytes_accessed=4 * 7 * rewards.size,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(rewards, values, next_values, term, done)
    return adv, tgt
