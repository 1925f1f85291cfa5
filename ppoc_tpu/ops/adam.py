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


def clip_by_global_norm(grads, max_norm: float):
    """Scale the whole gradient pytree so its global L2 norm is at most
    ``max_norm`` (the standard PPO stabilizer; no reference counterpart —
    gated off by default via PPOConfig.max_grad_norm = 0)."""
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads)
