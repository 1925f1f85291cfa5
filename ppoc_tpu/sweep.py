"""Seed-parallel training: N independent runs as ONE vmapped device program.

No reference counterpart — the reference trains a single seed per process
(global libc RNG, src/main.c:15-16) — but it is the kind of capability the
TPU execution model gives for free: the whole train-until-solved program
(ppo.train_until — rollouts, GAE, minibatch epochs, eval, the while loop)
is a pure function of (TrainState, key), so ``jax.vmap`` batches ENTIRE
TRAINING RUNS.  On a chip the small reference-scale program underutilizes
(single-digit MFU, see docs/RESULTS.md), S seeds cost far less than S
sequential runs — cross-seed variance tables and hyperparameter sweeps in
one dispatch.

PRNG threading matches ``Trainer`` exactly (PRNGKey(seed) -> split for init
-> split for the run), so a ONE-seed sweep reproduces ``Trainer.solve``'s
epoch count and eval R, with weights equal to float noise
(tests/test_sweep.py).  The vmap batch dim changes XLA's fusion/reduction
order (exactly like any batch-size change), so lanes drift from their
sequential twins at float level — the algorithm, schedules and PRNG
streams are identical.

The sweep runs the generic XLA path (backend="jnp"): the fused Pallas
kernels are written for one program instance and do not batch under vmap.
Memory scales with S — size n_envs accordingly.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ppoc_tpu import envs
from ppoc_tpu.algo import ppo
from ppoc_tpu.config import PPOConfig


_JIT_CACHE: Dict[Any, Any] = {}


def _cached_jit(key, builder):
    """Reuse the jitted sweep program across calls: jit's executable cache
    is keyed on the function OBJECT, so rebuilding the closure every call
    would re-trace and re-compile each time — on a TPU that puts tens of
    seconds of XLA compile inside what callers (bench_scaling
    --sweep) believe is a warmed-up timed region."""
    fn = _JIT_CACHE.get(key)
    if fn is None:
        if len(_JIT_CACHE) > 16:
            _JIT_CACHE.clear()
        fn = _JIT_CACHE[key] = builder()
    return fn


def _backend(cfg: PPOConfig) -> str:
    """Generic-XLA backend string carrying the config's gating options —
    the same top-k the Trainer would use (a bare "jnp" would silently
    degrade sparse MoE routing to dense gating)."""
    if cfg.n_experts > 1:
        from ppoc_tpu.models import mlp

        return mlp.moe_backend("jnp", cfg.moe_topk)
    return "jnp"


def _validate(cfg: PPOConfig, seeds: Sequence[int]) -> None:
    """The Trainer.__init__ config checks the sweep path must not bypass."""
    if not len(seeds):
        raise ValueError("sweep needs at least one seed")
    if cfg.num_minibatches < 1:
        raise ValueError(
            f"minibatch_size ({cfg.minibatch_size}) exceeds steps_per_fit "
            f"({cfg.steps_per_fit}): zero minibatches, nothing would train"
        )
    if cfg.tp_size > 1 or cfg.pp_size > 1 or cfg.ep_size > 1:
        raise ValueError(
            "sweeps are single-device vmapped programs; tp_size/pp_size/"
            "ep_size must be 1"
        )
    if cfg.rnn_hidden > 0:
        if cfg.n_experts > 1:
            raise ValueError("rnn_hidden > 0 cannot combine with n_experts")
        if not cfg.reset_per_fit:
            raise ValueError(
                "rnn_hidden > 0 requires reset_per_fit=True (windows must "
                "start at episode starts for the h0=0 replay)"
            )


def _init_states(cfg: PPOConfig, env, seeds: Sequence[int]):
    """Stacked TrainStates + run keys with Trainer's exact PRNG threading."""
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
    k_init, k_run = jax.vmap(lambda k: tuple(jax.random.split(k)))(keys)
    states = jax.vmap(lambda k: ppo.init_train_state(cfg, env, k))(k_init)
    return states, k_run


def solve_many(cfg: PPOConfig, seeds: Sequence[int], target_R: float,
               max_epochs: int = 100) -> Dict[str, Any]:
    """Train every seed until eval R >= ``target_R`` — one jitted dispatch.

    The vmapped ``lax.while_loop`` iterates until the SLOWEST seed solves
    (finished seeds' updates are masked by the batching rule), so wall-clock
    follows max(epochs) while the chip stays busy on all S programs.

    Returns {"epochs": [S], "R": [S], "states": stacked TrainState}.
    """
    _validate(cfg, seeds)
    env = envs.make(cfg.env)
    backend = _backend(cfg)
    states, k_run = _init_states(cfg, env, seeds)

    def one(ts, key):
        k, _ = jax.random.split(key)
        return ppo.train_until(cfg, env, ts, k, target_R=target_R,
                               max_epochs=max_epochs, backend=backend)

    run = _cached_jit(("solve", cfg, target_R, max_epochs),
                      lambda: jax.jit(jax.vmap(one)))
    new_states, n, R = run(states, k_run)
    n, R = jax.device_get((n, R))
    return {"epochs": [int(x) for x in n], "R": [float(x) for x in R],
            "states": new_states}


def train_many(cfg: PPOConfig, seeds: Sequence[int],
               n_epochs: Optional[int] = None) -> Dict[str, Any]:
    """Fixed-schedule sweep: per-seed learning curves in one dispatch.

    Returns {"R": [S, n_epochs], "J": [S, n_epochs], "entropy": [S, n_epochs],
    "states": stacked TrainState} — the raw material for cross-seed
    variance tables (docs/RESULTS.md).
    """
    n_epochs = cfg.n_epochs if n_epochs is None else n_epochs
    _validate(cfg, seeds)
    env = envs.make(cfg.env)
    backend = _backend(cfg)
    states, k_run = _init_states(cfg, env, seeds)

    def one(ts, key):
        def epoch(carry, _):
            ts, key = carry
            key, k_train, k_eval = jax.random.split(key, 3)
            ts, metrics = ppo.train_epoch(cfg, env, ts, k_train,
                                          backend=backend)
            ev = ppo.evaluate(cfg, env, ts.policy_params, k_eval, backend)
            return (ts, key), (ev.R, ev.J, metrics.entropy)

        (ts, _), (R, J, ent) = jax.lax.scan(
            epoch, (ts, key), None, length=n_epochs)
        return ts, R, J, ent

    run = _cached_jit(("train", cfg, n_epochs),
                      lambda: jax.jit(jax.vmap(one)))
    new_states, R, J, ent = run(states, k_run)
    R, J, ent = jax.device_get((R, J, ent))
    return {"R": R, "J": J, "entropy": ent, "states": new_states}
