"""Host-environment bridge: train on arbitrary Gymnasium envs.

Capability-parity replacement for the reference's embedded-CPython bridge
(``src/gym_env.c`` + ``scripts/gym_env.py``, components 14-15 in SURVEY.md):
the reference embeds a Python interpreter inside its C binary to step ONE
Gymnasium env per rollout step; here the framework *is* Python, so the bridge
is the other way around — a vectorized Gymnasium actor on the host feeding
the jitted TPU learner (``ppo.update_step``).

This is the actor/learner split the reference has (CPU rollouts, GPU
updates, src/ppo.cu:479-539) and the pure-JAX envs deliberately collapse;
it exists so users can bring ANY Gymnasium env, not just the in-repo
physics.  Per policy step there is exactly ONE device round trip (batched
action sampling for all n_envs), vs the reference's per-step C->Python
crossing for a single env (src/gym_env.c:61-93).

Env ids follow the reference's registry (scripts/gym_env.py:11-17):
id 0 = Pendulum-v1, id 1 = BipedalWalker-v3; any Gymnasium id string works.
"""
from __future__ import annotations

import numpy as np

from ppoc_tpu.config import PPOConfig
from ppoc_tpu.envs.core import EnvSpec

# reference env-id table (scripts/gym_env.py:11-17)
ENV_IDS = {0: "Pendulum-v1", 1: "BipedalWalker-v3"}


def _gymnasium():
    try:
        import gymnasium
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the Gymnasium bridge needs the 'gymnasium' package; the pure-JAX "
            "envs (ppoc_tpu.envs.make) have no such dependency"
        ) from e
    return gymnasium


class GymVecEnv:
    """n_envs synchronous Gymnasium instances with per-env auto-reset.

    Mirrors the reference rollout semantics (collect_trajectories,
    src/ppo.cu:54-79): ``step`` returns the TRUE successor observation for
    GAE bootstrapping plus the post-reset observation the policy acts on
    next.
    """

    def __init__(self, env_id, n_envs: int, seed: int = 0):
        gymnasium = _gymnasium()
        if isinstance(env_id, int):
            env_id = ENV_IDS[env_id]
        self.name = env_id
        self.n_envs = n_envs
        self._seed = seed
        self.envs = [gymnasium.make(env_id) for _ in range(n_envs)]
        e0 = self.envs[0]
        obs_space, act_space = e0.observation_space, e0.action_space
        discrete = hasattr(act_space, "n")
        horizon = e0.spec.max_episode_steps or 1000
        if not discrete:
            # EnvSpec carries SCALAR action bounds; silently taking dim 0
            # would mis-scale asymmetric Boxes (ADVICE r1 #4) — validate.
            low = np.asarray(act_space.low, np.float32).reshape(-1)
            high = np.asarray(act_space.high, np.float32).reshape(-1)
            if not (np.all(low == low[0]) and np.all(high == high[0])):
                raise ValueError(
                    f"{env_id}: per-dimension action bounds differ "
                    f"(low={low.tolist()}, high={high.tolist()}); EnvSpec "
                    f"supports a single scalar bound pair — wrap the env with "
                    f"a RescaleAction transform first"
                )
        self.spec = EnvSpec(
            name=f"gym:{env_id}",
            obs_dim=int(np.prod(obs_space.shape)),
            action_dim=int(act_space.n) if discrete else int(np.prod(act_space.shape)),
            horizon=int(horizon),
            gamma=0.99,  # reference fixes gamma for gym envs (src/gym_env.c:102)
            discrete=discrete,
            action_low=float(getattr(act_space, "low", [-1.0])[0]) if not discrete else -1.0,
            action_high=float(getattr(act_space, "high", [1.0])[0]) if not discrete else 1.0,
        )
        self._episode = 0

    def reset(self) -> np.ndarray:
        obs = np.stack([
            e.reset(seed=self._seed + i + 1000 * self._episode)[0]
            for i, e in enumerate(self.envs)
        ]).astype(np.float32)
        self._episode += 1
        return obs.reshape(self.n_envs, -1)

    def step(self, actions: np.ndarray):
        n = self.n_envs
        next_obs = np.zeros((n, self.spec.obs_dim), np.float32)
        obs_after = np.zeros((n, self.spec.obs_dim), np.float32)
        reward = np.zeros((n,), np.float32)
        term = np.zeros((n,), bool)
        trunc = np.zeros((n,), bool)
        for i, e in enumerate(self.envs):
            a = actions[i]
            if self.spec.discrete:
                a = int(a[0])
            o, r, te, tr, _ = e.step(a)
            o = np.asarray(o, np.float32).reshape(-1)
            next_obs[i], reward[i], term[i], trunc[i] = o, r, te, tr
            if te or tr:
                self._episode += 1
                o2, _ = e.reset(seed=self._seed + i + 1000 * self._episode)
                obs_after[i] = np.asarray(o2, np.float32).reshape(-1)
            else:
                obs_after[i] = o
        return obs_after, next_obs, reward, term, trunc

    def close(self):
        for e in self.envs:
            e.close()


def collect_host(cfg, venv, policy_params, key, length, backend="jnp"):
    """Host rollout against a Gymnasium venv — delegates to the generic
    host-protocol collector (ppoc_tpu.envs.host.collect_host)."""
    from ppoc_tpu.envs.host import collect_host as _collect
    return _collect(cfg, venv, policy_params, key, length, backend)


class GymTrainer:
    """Trainer over a host Gymnasium env: host actor + jitted device learner.

    Thin construction wrapper around :class:`ppoc_tpu.envs.host.HostTrainer`
    with GymVecEnv actors (train/eval), preserving the reference env-id
    table (scripts/gym_env.py:11-17).
    """

    def __new__(cls, cfg: PPOConfig, env_id, backend: str = "jnp"):
        from ppoc_tpu.envs.host import HostTrainer

        venv = GymVecEnv(env_id, cfg.n_envs, seed=cfg.seed)
        eval_venv = GymVecEnv(env_id, cfg.eval_envs, seed=cfg.seed + 7777)
        return HostTrainer(cfg, venv, eval_venv, backend=backend)
