"""Host-environment protocol + trainer: any host-stepped env feeds the
jitted TPU learner.

Generalizes the actor/learner split the reference hard-codes (CPU rollouts
into the GPU update, src/ppo.cu:479-539) into a protocol:

    venv.spec                  -> EnvSpec
    venv.reset() -> obs        [n, obs_dim]
    venv.step(a) -> (obs_after, next_obs, reward, terminated, truncated)

where ``next_obs`` is the TRUE successor (GAE bootstrap source) and
``obs_after`` is post-auto-reset (what the policy acts on next) — the
semantics of collect_trajectories (src/ppo.cu:54-79).

Implementations: :class:`ppoc_tpu.envs.gym_bridge.GymVecEnv` (any Gymnasium
env) and :class:`NativeHostVecEnv` below (the C++ engine from
ppoc_tpu/native — the reference's "CPU env in native code" path,
src/env.c, running n instances vectorized).
"""
from __future__ import annotations

import functools
import time
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ppoc_tpu.algo import ppo
from ppoc_tpu.config import PPOConfig
from ppoc_tpu.envs.core import Env, EnvSpec
from ppoc_tpu.models import policy as policy_mod


class NativeHostVecEnv:
    """Host-protocol adapter over the C++ vectorized engine
    (ppoc_tpu.native.NativeVecEnv) with per-env auto-reset."""

    def __init__(self, name: str, n_envs: int, seed: int = 0):
        from ppoc_tpu import envs as jax_envs
        from ppoc_tpu import native

        self._nat = native.NativeVecEnv(name, n_envs)
        self._resetter = native.NativeVecEnv(name, n_envs)
        self.n_envs = n_envs
        self._seed = seed
        self._episode = 0
        # reuse the registry spec so hyperparameters (gamma, horizon) match
        self.spec: EnvSpec = jax_envs.make(name).spec

    def reset(self) -> np.ndarray:
        self._episode += 1
        return self._nat.reset(seed=self._seed + 7919 * self._episode)

    def step(self, actions: np.ndarray):
        a = np.ascontiguousarray(actions, np.float32).reshape(self.n_envs, -1)
        next_obs, reward, term, trunc = self._nat.step(a)
        done = term | trunc
        obs_after = next_obs.copy()
        if done.any():
            # Reset only the finished instances, sourced from a freshly
            # seeded full batch (the C++ reset is vectorized and ~ns/env, so
            # the O(n) refresh is cheaper than plumbing partial resets
            # through the C ABI).
            idx = np.nonzero(done)[0]
            self._episode += 1
            fresh = self._resetter.reset(seed=self._seed + 7919 * self._episode)
            self._nat.states[idx] = self._resetter.states[idx]
            self._nat.steps[idx] = 0
            obs_after[idx] = fresh[idx]
        return obs_after, next_obs, reward, term, trunc

    def close(self):
        pass


@functools.lru_cache(maxsize=32)
def _sampler(activation: str, backend: str, discrete: bool):
    """One persistent jitted sampler per (activation, backend, discrete) —
    a fresh jax.jit wrapper per rollout would retrace/recompile every fit."""
    return jax.jit(functools.partial(
        policy_mod.sample, activation=activation, backend=backend, discrete=discrete,
    ))


def collect_host(
    cfg: PPOConfig,
    venv,
    policy_params,
    key: jax.Array,
    length: int,
    backend: str = "jnp",
    obs0: Optional[np.ndarray] = None,
    force_truncate: bool = True,
) -> Tuple[ppo.Transition, np.ndarray]:
    """Host rollout loop against any host-protocol venv: device policy (one
    batched sample call per step), host env stepping — collect_trajectories
    (src/ppo.cu:54-79) with n_envs instances in lockstep.

    ``obs0=None`` resets the venv at entry; passing the previous call's
    returned observation continues the same episodes (reset_per_fit=False).
    Returns (trajectory, last observation)."""
    sample = _sampler(cfg.activation, backend, venv.spec.discrete)
    obs = venv.reset() if obs0 is None else obs0
    rows = []
    for _ in range(length):
        key, k = jax.random.split(key)
        action, log_prob = jax.device_get(sample(policy_params, jnp.asarray(obs), k))
        obs_after, next_obs, reward, term, trunc = venv.step(np.asarray(action))
        rows.append((obs, action, np.asarray(log_prob), next_obs, reward, term, trunc))
        obs = obs_after
    stack = [np.stack(x) for x in zip(*rows)]
    traj = ppo.Transition(*[jnp.asarray(x) for x in stack])
    if force_truncate:  # (src/ppo.cu:70-74); eval keeps genuine flags
        last_trunc = jnp.logical_or(
            traj.truncated[-1], jnp.logical_not(traj.terminated[-1])
        )
        traj = traj._replace(truncated=traj.truncated.at[-1].set(last_trunc))
    return traj, obs


class HostTrainer:
    """Trainer over host-protocol envs: host actor + jitted device learner.

    API-compatible subset of :class:`ppoc_tpu.algo.trainer.Trainer`
    (train / train_epoch / evaluate / save / load).
    """

    def __init__(self, cfg: PPOConfig, venv, eval_venv, backend: str = "jnp"):
        if venv.n_envs != cfg.n_envs:
            raise ValueError(
                f"venv has {venv.n_envs} envs but cfg.n_envs is {cfg.n_envs} "
                f"— the minibatch schedule (cfg.num_minibatches) is derived "
                f"from cfg.n_envs * rollout_len"
            )
        if eval_venv.n_envs != cfg.eval_envs:
            raise ValueError(
                f"eval_venv has {eval_venv.n_envs} envs but cfg.eval_envs "
                f"is {cfg.eval_envs}"
            )
        if cfg.num_minibatches < 1:
            raise ValueError(
                f"minibatch_size ({cfg.minibatch_size}) exceeds steps_per_fit "
                f"({cfg.steps_per_fit}): zero minibatches, nothing would train"
            )
        self.cfg = cfg
        self.venv = venv
        self.eval_venv = eval_venv
        # spec-only Env shell for the learner (reset/step never called)
        self.env = Env(spec=venv.spec, reset=None, step=None)
        self.backend = backend
        self.key = jax.random.PRNGKey(cfg.seed)
        k_init, self.key = jax.random.split(self.key)
        self.state = ppo.init_train_state(cfg, self.env, k_init)
        self._update = jax.jit(functools.partial(
            ppo.update_step, cfg, self.env, backend=backend
        ))
        self._obs = None  # persistent rollout obs when reset_per_fit=False

    def train_fit(self):
        k_roll, k_upd, self.key = jax.random.split(self.key, 3)
        obs0 = None if self.cfg.reset_per_fit else self._obs
        traj, last_obs = collect_host(
            self.cfg, self.venv, self.state.policy_params, k_roll,
            self.cfg.rollout_len, self.backend, obs0=obs0,
        )
        if not self.cfg.reset_per_fit:
            self._obs = last_obs
        self.state, metrics = self._update(self.state, traj, k_upd)
        return metrics

    def train_epoch(self):
        all_metrics = [self.train_fit() for _ in range(self.cfg.fits_per_epoch)]
        # mean over fits, matching the device trainer's per-epoch metrics
        return jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs)), *all_metrics)

    def evaluate(self) -> ppo.EvalMetrics:
        k, self.key = jax.random.split(self.key)
        traj, _ = collect_host(
            self.cfg, self.eval_venv, self.state.policy_params, k,
            self.cfg.eval_len, self.backend, force_truncate=False,
        )
        m = ppo.eval_metrics_from_traj(traj, self.env.spec.gamma)
        return jax.tree.map(float, jax.device_get(m))

    def train(self, n_epochs: Optional[int] = None, log: bool = True,
              stop_at_R: Optional[float] = None) -> List[dict]:
        n_epochs = self.cfg.n_epochs if n_epochs is None else n_epochs
        history: List[dict] = []
        for i in range(n_epochs):
            tic = time.perf_counter()
            fm = self.train_epoch()
            fm = jax.tree.map(float, jax.device_get(fm))
            toc = time.perf_counter()  # train time only, like Trainer.train
            ev = self.evaluate()
            row = {"epoch": i, "entropy": fm.entropy,
                   "time_s": toc - tic,
                   "J": ev.J, "R": ev.R, "episodes": int(ev.episodes)}
            history.append(row)
            if log:
                print(f"Epoch: {i} Entropy: {row['entropy']:f} "
                      f"Time {row['time_s']:f}s J: {row['J']:f} R: {row['R']:f} "
                      f"Episodes: {row['episodes']}", flush=True)
            if stop_at_R is not None and ev.R >= stop_at_R:
                break
        return history

    def save(self, path: str) -> None:
        from ppoc_tpu.utils import checkpoint
        checkpoint.save(path, self.cfg, self.env.spec, self.state, key=self.key)

    def load(self, path: str) -> None:
        """Restore optimizer state + PRNG key.  NOTE: unlike the device
        Trainer, host envs (live Gymnasium objects) are not serializable, so
        a resumed host run continues from fresh env resets — optimization
        state is exact, the env stream is not."""
        from ppoc_tpu.utils import checkpoint
        ck = checkpoint.load(path, template=self.state)
        self.state = ck.state
        if ck.key is not None:
            self.key = ck.key
