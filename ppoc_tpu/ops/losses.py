"""PPO loss functions.

Equivalents of the reference's fused loss kernels:

  * clipped surrogate — ``policy_loss_and_grad`` (src/ppo.cu:82-107 CPU,
    ``policy_loss_kernel`` src/ppo.cu:109-143 CUDA).  The reference computes
    the gradient by hand so that it flows only through the unclipped branch;
    autodiff of ``-mean(min(r*A, clip(r)*A))`` yields the identical gradient
    (the clipped branch is constant in r), verified in tests/test_ops.py
    (test_clipped_surrogate_value_and_grad_match_reference).
  * value MSE — ``mean_squared_error(_derivative)`` (src/loss.cu:5-23).
  * entropy bonus — closed-form diagonal-Gaussian entropy added as
    ``-ent_coeff * H`` (src/ppo.cu:103-104); its gradient reaches only
    ``log_std`` because H depends on nothing else (src/ppo.cu:436-438).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clipped_surrogate_loss(
    log_probs: jax.Array,
    old_log_probs: jax.Array,
    advantages: jax.Array,
    clip_eps: float,
) -> jax.Array:
    """-E[min(r*A, clip(r, 1-eps, 1+eps)*A)], r = exp(logp - old_logp)."""
    ratio = jnp.exp(log_probs - old_log_probs)
    clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    return -jnp.mean(jnp.minimum(ratio * advantages, clipped * advantages))


def value_loss(v_pred: jax.Array, v_target: jax.Array) -> jax.Array:
    """Mean squared error over all elements (src/loss.cu:5-13)."""
    return jnp.mean(jnp.square(v_pred - v_target))


def clipped_value_loss(v_pred: jax.Array, v_old: jax.Array,
                       v_target: jax.Array, clip: float) -> jax.Array:
    """PPO2-style value clipping (no reference counterpart, default-off):
    elementwise max of the unclipped squared error and the squared error of
    V_old + clip(V - V_old, +/-clip), pessimistically bounding how far V may
    move from its rollout-time predictions in one fit."""
    v_clipped = v_old + jnp.clip(v_pred - v_old, -clip, clip)
    return jnp.mean(jnp.maximum(jnp.square(v_pred - v_target),
                                jnp.square(v_clipped - v_target)))
