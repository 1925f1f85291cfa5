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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppoc_tpu.ops import vmem


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Empirical Mosaic scoped-VMEM ceiling on v5e: a [200, 4096] f32 plane
# (3.3 MB) compiles, [200, 8192] (6.6 MB) is rejected — the kernel keeps
# several [T, E] planes live at once.  Bigger shapes are env-CHUNKED over a
# grid (the recurrence is lane-local; only normalization is global, and it
# moves to a cheap fused XLA pass).  Grid cells are double-buffered by the
# block pipeline, so the per-cell plane limit is half the single-shot one.
_PLANE_BYTE_LIMIT = 4 * 1024 * 1024
# the kernel touches 9 per-cell planes (5 in + 2 out + 2 scratch); gridded
# in/out blocks are double-buffered, so cap the per-cell plane total at
# 8 MB (~16 MB pipelined) — same discipline as pallas_rollout.chunk_plan
_N_PLANES = 9
_CHUNK_VMEM_BUDGET = 8 * 1024 * 1024

# pin the scoped-VMEM cap rather than inheriting the environment default
# (see ops/pallas_rollout._COMPILER_PARAMS)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024)


def chunk_plan(T: int, E: int) -> Optional[int]:
    """Grid cells needed for this shape (1 = single-shot), or None when no
    128-lane-aligned chunking fits the per-cell plane budget."""
    if 4 * T * E <= _PLANE_BYTE_LIMIT:
        return 1
    return vmem.search_chunks(
        E, lambda Ec: _N_PLANES * 4 * T * Ec <= _CHUNK_VMEM_BUDGET
    )


def fits_vmem(T: int, E: int) -> bool:
    return chunk_plan(T, E) is not None


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
    n_chunks: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (advantages [normalized if requested], value targets).

    Shapes past the single-shot VMEM ceiling run as a grid of C env-chunks
    (``chunk_plan``); the lane-local recurrence is unchanged, and the
    global normalization moves to a fused XLA pass over the kernel's
    output (identical formula, so C is an execution detail)."""
    T, E = rewards.shape
    C = chunk_plan(T, E) if n_chunks is None else n_chunks
    if C is None or E % C != 0:
        raise ValueError(
            f"no valid env chunking for GAE at T={T}, E={E} "
            f"(n_chunks={n_chunks}); caller should gate on fits_vmem()")
    Ec = E // C
    term = terminated.astype(jnp.float32)
    done = jnp.logical_or(terminated, truncated).astype(jnp.float32)
    if C == 1:
        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        grid = ()
        in_kernel_norm = normalize
    else:
        spec = pl.BlockSpec((T, Ec), lambda c: (0, c))
        grid = (C,)
        in_kernel_norm = False   # global moments span cells -> XLA pass
    adv, tgt = pl.pallas_call(
        functools.partial(_kernel, gamma, lam, in_kernel_norm, T),
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(rewards.shape, jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((T, Ec), jnp.float32),
                        pltpu.VMEM((T, Ec), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=12 * rewards.size,
            bytes_accessed=4 * 7 * rewards.size,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(rewards, values, next_values, term, done)
    if normalize and not in_kernel_norm:
        mean = jnp.mean(adv)
        var = jnp.mean(jnp.square(adv - mean))
        adv = (adv - mean) / (jnp.sqrt(var) + 1e-8)
    return adv, tgt
