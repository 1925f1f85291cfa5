"""Adam optimizer over parameter pytrees, implemented in-repo.

Equivalent of the reference's flat-state Adam over pointer lists
(``src/adam.cu:53-74`` CPU, ``adam_update_kernel`` src/adam.cu:138-153):

    t      += 1
    m       = b1*m + (1-b1)*g
    v       = b2*v + (1-b2)*g^2
    denom   = sqrt(v / (1 - b2^t)) + eps          # eps OUTSIDE the sqrt
    p      -= lr / (1 - b1^t) * m / denom

Owning the (m, v, t) layout (instead of using optax) keeps checkpoint parity
with the reference's save format, which serializes m, v and the timestep
(src/adam.cu:172-189).  The update is elementwise, so one pytree Adam with
its own ``t`` is exactly one reference ``Adam`` instance; the trainer keeps
three (policy net, value net, log_std) like create_ppo (src/ppo.cu:19-25).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: Any          # pytree like params
    v: Any          # pytree like params
    t: jax.Array    # i32 scalar timestep


def init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params), t=jnp.zeros((), jnp.int32))


def update(
    params,
    grads,
    state: AdamState,
    lr: float,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[Any, AdamState]:
    t = state.t + 1
    tf = t.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** tf
    bc2 = 1.0 - beta2 ** tf
    step_size = lr / bc1

    def upd(p, g, m, v):
        m2 = beta1 * m + (1.0 - beta1) * g
        v2 = beta2 * v + (1.0 - beta2) * jnp.square(g)
        denom = jnp.sqrt(v2 / bc2) + eps
        return p - step_size * m2 / denom, m2, v2

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(m=new_m, v=new_v, t=t)


# --------------------------------------------------------------------------
# ZeRO-1: optimizer-state sharding over the data-parallel axis
# --------------------------------------------------------------------------
#
# The reference replicates nothing (single GPU); at scale, replicating Adam's
# m/v on every data-parallel rank wastes 2x parameter memory per rank.  The
# standard fix (ZeRO stage 1 / FSDP optimizer sharding) keeps params
# replicated for the forward/backward but gives each rank a 1/N slice of the
# flattened moment vectors: after the gradient pmean, every rank runs Adam on
# its slice only and the updated parameter slices ride ONE all_gather back to
# replication.  Per-rank optimizer math and memory drop N-fold; the
# all_gather replaces no existing collective (grads were already pmean'd).

def pack_zero1(state: AdamState, n_shards: int) -> AdamState:
    """Tree-layout moments -> flat zero-padded [n_shards * L] arrays (the
    logical <-> placed converter for checkpoints; order matches the
    checkpoint's flat Adam serialization, jax tree-flatten order)."""
    from jax.flatten_util import ravel_pytree

    def flat_pad(tree):
        flat = ravel_pytree(tree)[0]
        pad = -flat.size % n_shards
        return jnp.pad(flat, (0, pad))

    return AdamState(m=flat_pad(state.m), v=flat_pad(state.v), t=state.t)


def unpack_zero1(state: AdamState, params) -> AdamState:
    """Flat packed moments -> the parameter tree layout (checkpoint form)."""
    from jax.flatten_util import ravel_pytree

    flat_p, unravel = ravel_pytree(params)

    def unflat(flat):
        return unravel(flat[: flat_p.size])

    return AdamState(m=unflat(state.m), v=unflat(state.v), t=state.t)


def update_zero1(
    params,
    grads,
    state: AdamState,
    lr: float,
    beta1: float,
    beta2: float,
    eps: float,
    axis_name: str,
) -> Tuple[Any, AdamState]:
    """One sharded Adam step inside shard_map: ``params``/``grads`` are
    replicated pytrees, ``state.m``/``state.v`` are this rank's flat
    [total_padded / N] slices.  Returns (replicated updated params, updated
    local moment slices)."""
    from jax.flatten_util import ravel_pytree

    t = state.t + 1
    tf = t.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** tf
    bc2 = 1.0 - beta2 ** tf
    step_size = lr / bc1

    flat_p, unravel = ravel_pytree(params)
    flat_g = ravel_pytree(grads)[0]
    loc = state.m.shape[0]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name) * loc
    pad = n * loc - flat_p.size
    p_loc = jax.lax.dynamic_slice(jnp.pad(flat_p, (0, pad)), (idx,), (loc,))
    g_loc = jax.lax.dynamic_slice(jnp.pad(flat_g, (0, pad)), (idx,), (loc,))

    m2 = beta1 * state.m + (1.0 - beta1) * g_loc
    v2 = beta2 * state.v + (1.0 - beta2) * jnp.square(g_loc)
    denom = jnp.sqrt(v2 / bc2) + eps
    p2_loc = p_loc - step_size * m2 / denom

    # all-gather the disjoint updated slices, expressed as a psum so the
    # result is REPLICATED-typed under shard_map's varying-axes system (a
    # raw all_gather would leave the params device-varying and fail the
    # out_specs=P() replication check on the training state)
    buf = jnp.zeros((n * loc,), p2_loc.dtype)
    buf = jax.lax.dynamic_update_slice(buf, p2_loc, (idx,))
    p2_flat = jax.lax.psum(buf, axis_name)
    return unravel(p2_flat[: flat_p.size]), AdamState(m=m2, v=v2, t=t)


def clip_by_global_norm(grads, max_norm: float):
    """Scale the whole gradient pytree so its global L2 norm is at most
    ``max_norm`` (the standard PPO stabilizer; no reference counterpart —
    gated off by default via PPOConfig.max_grad_norm = 0)."""
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads)
