"""Stochastic policies: diagonal Gaussian (reference parity) and categorical.

The Gaussian policy reproduces the reference ``GaussianPolicy``
(src/policy.cu, include/policy.h:13-37): an MLP mean ``mu`` plus a
state-independent learnable ``log_std`` vector initialized to log(init_std)
(src/policy.cu:22-26), with

  * sampling  a = mu + eps * exp(log_std)      (src/policy.cu:76-89; the
    Box-Muller host RNG becomes jax.random.normal)
  * log-prob  -k/2*log(2pi) - sum_j [log_std_j + ((a_j-mu_j)/exp(log_std_j))^2 / 2]
    (src/policy.cu:67-74)
  * entropy   k/2*(1+log(2pi)) + sum_j log_std_j   (src/policy.cu:171-178)

The hand-coded log-prob backward (src/policy.cu:101-111) is replaced by
autodiff; the reference's CUDA logprob kernel bug for action_size>1
(src/policy.cu:113-125, noted in SURVEY.md) is NOT reproduced.

The categorical policy extends the same interface to discrete-action envs
(CartPole config in BASELINE.json); the reference has no discrete path.
"""
from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import mlp

LOG_2PI = math.log(2.0 * math.pi)


def init_gaussian(
    key: jax.Array,
    obs_dim: int,
    action_dim: int,
    hidden: Sequence[int],
    init_std: float = 1.0,
) -> Dict:
    sizes = (obs_dim, *hidden, action_dim)
    # jnp.log (not math.log) so init_std may be a traced scalar — the
    # hyperparameter-grid sweep (ppoc_tpu.sweep.solve_grid) vmaps it
    return {
        "mlp": mlp.init(key, sizes),
        "log_std": jnp.full((action_dim,), jnp.log(jnp.float32(init_std)),
                            jnp.float32),
    }


def init_categorical(key: jax.Array, obs_dim: int, n_actions: int, hidden: Sequence[int]) -> Dict:
    sizes = (obs_dim, *hidden, n_actions)
    return {"mlp": mlp.init(key, sizes)}


# --- Gaussian ---------------------------------------------------------------

def gaussian_mean(params: Dict, obs: jax.Array, activation: str, backend: str) -> jax.Array:
    return mlp.apply(params["mlp"], obs, activation, backend)


def gaussian_log_prob_from_mean(mu: jax.Array, log_std: jax.Array, action: jax.Array) -> jax.Array:
    k = action.shape[-1]
    z = (action - mu) * jnp.exp(-log_std)
    return -0.5 * k * LOG_2PI - jnp.sum(log_std + 0.5 * jnp.square(z), axis=-1)


def gaussian_sample(
    params: Dict, obs: jax.Array, key: jax.Array, activation: str, backend: str
) -> Tuple[jax.Array, jax.Array]:
    """Sample actions and their log-probs for a batch of observations."""
    mu = gaussian_mean(params, obs, activation, backend)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    action = mu + eps * jnp.exp(params["log_std"])
    return action, gaussian_log_prob_from_mean(mu, params["log_std"], action)


def gaussian_log_prob(
    params: Dict, obs: jax.Array, action: jax.Array, activation: str, backend: str
) -> jax.Array:
    mu = gaussian_mean(params, obs, activation, backend)
    return gaussian_log_prob_from_mean(mu, params["log_std"], action)


def gaussian_entropy(params: Dict) -> jax.Array:
    k = params["log_std"].shape[0]
    return 0.5 * k * (1.0 + LOG_2PI) + jnp.sum(params["log_std"])


# --- Categorical -------------------------------------------------------------

def categorical_sample(
    params: Dict, obs: jax.Array, key: jax.Array, activation: str, backend: str
) -> Tuple[jax.Array, jax.Array]:
    logits = mlp.apply(params["mlp"], obs, activation, backend)
    action = jax.random.categorical(key, logits, axis=-1)
    logp = jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), action[..., None], axis=-1
    )[..., 0]
    return action[..., None].astype(jnp.int32), logp


def categorical_log_prob(
    params: Dict, obs: jax.Array, action: jax.Array, activation: str, backend: str
) -> jax.Array:
    logits = mlp.apply(params["mlp"], obs, activation, backend)
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp_all, action.astype(jnp.int32), axis=-1)[..., 0]


def categorical_entropy(params: Dict, obs: jax.Array, activation: str, backend: str) -> jax.Array:
    logits = mlp.apply(params["mlp"], obs, activation, backend)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.sum(jnp.exp(logp) * logp, axis=-1))


def act_from_out(out, key, discrete, log_std=None, deterministic=False):
    """(action, log_prob) from a PRECOMPUTED head output (logits or Gaussian
    mean).  Single owner of the distribution math for callers that run the
    trunk themselves — the recurrent rollout (algo/recurrent.py) and
    recurrent serving (serve.py) — so sampling semantics can never drift
    from the feedforward paths above.  The log_prob is that of the returned
    action under the STOCHASTIC policy (as in mode())."""
    if discrete:
        if deterministic:
            a_idx = jnp.argmax(out, axis=-1)
        else:
            a_idx = jax.random.categorical(key, out, axis=-1)
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(out, axis=-1), a_idx[..., None], axis=-1
        )[..., 0]
        return a_idx[..., None].astype(jnp.int32), logp
    if deterministic:
        action = out
    else:
        eps = jax.random.normal(key, out.shape, out.dtype)
        action = out + eps * jnp.exp(log_std)
    return action, gaussian_log_prob_from_mean(out, log_std, action)


# --- unified dispatch ---------------------------------------------------------

def init(key, obs_dim, action_dim, hidden, init_std, discrete):
    if discrete:
        return init_categorical(key, obs_dim, action_dim, hidden)
    return init_gaussian(key, obs_dim, action_dim, hidden, init_std)


def sample(params, obs, key, activation, backend, discrete):
    if discrete:
        return categorical_sample(params, obs, key, activation, backend)
    return gaussian_sample(params, obs, key, activation, backend)


def mode(params, obs, activation, backend, discrete):
    """(action, log_prob) of the distribution MODE — Gaussian mean /
    categorical argmax.  The reference has no deterministic acting path
    (its evaluator is stochastic, src/ppo.cu:560-583); this serves the
    standard mean-policy evaluation protocol.  The log_prob is that of the
    returned action under the stochastic policy."""
    out = mlp.apply(params["mlp"], obs, activation, backend)
    if discrete:
        action = jnp.argmax(out, axis=-1)
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(out, axis=-1), action[..., None], axis=-1
        )[..., 0]
        return action[..., None].astype(jnp.int32), logp
    return out, gaussian_log_prob_from_mean(out, params["log_std"], out)


def log_prob(params, obs, action, activation, backend, discrete):
    if discrete:
        return categorical_log_prob(params, obs, action, activation, backend)
    return gaussian_log_prob(params, obs, action, activation, backend)


def entropy(params, obs, activation, backend, discrete):
    if discrete:
        return categorical_entropy(params, obs, activation, backend)
    return gaussian_entropy(params)
