"""Policy serving: rebuild a trained policy from a checkpoint and act.

The reference's deployment flow is ``load_ppo`` + per-step ``sample_action``
(src/ppo.cu:610-648, src/policy.cu:76-89 — implemented but never wired into
main).  Here it is a first-class two-liner:

    act = ppoc_tpu.serve.load_policy("model.bin")
    action = act(obs)                  # [B, obs_dim] -> [B, act_dim]

``act`` is one jitted device call per batch; ``deterministic=True`` (the
default) serves the Gaussian mean / categorical argmax, ``False`` samples
the stochastic policy like the reference's evaluator.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def load_policy(path: str, deterministic: bool = True,
                seed: int = 0) -> Callable:
    """Load a version-3 checkpoint and return ``act(obs) -> action``.

    Batched: ``obs`` is [B, obs_dim] (a single [obs_dim] vector is also
    accepted).  Discrete checkpoints return int32 class indices [B, 1];
    continuous ones return [B, act_dim] actions.
    """
    from ppoc_tpu import envs
    from ppoc_tpu.models import mlp, policy as policy_mod
    from ppoc_tpu.utils import checkpoint

    ck = checkpoint.load(path)
    if ck.cfg is None:
        raise ValueError(
            f"{path}: version-2 checkpoint has no embedded config; "
            f"re-save it with this version (Trainer.save) first"
        )
    cfg = ck.cfg
    try:
        spec = envs.make(cfg.env).spec
    except KeyError:
        # host-bridge checkpoints (cfg.env = "gym:<id>") have no registry
        # entry; serving only needs the dims, which the file carries
        from ppoc_tpu.envs.core import EnvSpec

        spec = EnvSpec(
            name=cfg.env, obs_dim=ck.dims["obs_dim"],
            action_dim=ck.dims["action_dim"], horizon=0, gamma=0.99,
            discrete=ck.dims["discrete"],
        )
    params = ck.state.policy_params
    from ppoc_tpu.models import gru

    if gru.is_rnn(params["mlp"]):
        raise ValueError(
            f"{path} holds a recurrent (GRU) policy, which needs a hidden "
            f"state between steps; use serve.load_recurrent_policy instead"
        )
    # MoE checkpoints serve through the same structural dispatch in
    # mlp.apply; the backend string carries the trained gating top-k
    backend = (mlp.moe_backend("jnp", cfg.moe_topk)
               if getattr(cfg, "n_experts", 1) > 1 else "jnp")
    key_holder = {"key": jax.random.PRNGKey(seed)}

    # a policy trained under RunningObsNorm (envs/wrappers.py) expects
    # normalized inputs; HostTrainer.save writes the statistics as a sidecar
    norm = None
    import os
    if os.path.exists(path + ".obsnorm.npz"):
        import numpy as np

        from ppoc_tpu.envs.wrappers import RunningStats

        sidecar = np.load(path + ".obsnorm.npz")
        stats = RunningStats(int(np.asarray(sidecar["mean"]).shape[0]))
        stats.load_state_dict(sidecar)
        # replay the exact training-time normalization (clip/eps ride in
        # the sidecar; older sidecars fall back to the wrapper defaults)
        clip = float(sidecar["clip"]) if "clip" in sidecar else 10.0
        eps = float(sidecar["eps"]) if "eps" in sidecar else 1e-8
        norm = lambda o: stats.normalize(o, clip=clip, eps=eps)

    if spec.discrete:
        @jax.jit
        def _det(obs):
            logits = mlp.apply(params["mlp"], obs, cfg.activation, backend)
            return jnp.argmax(logits, axis=-1)[..., None].astype(jnp.int32)

        @jax.jit
        def _sto(obs, key):
            a, _ = policy_mod.categorical_sample(
                params, obs, key, cfg.activation, backend)
            return a
    else:
        @jax.jit
        def _det(obs):
            return policy_mod.gaussian_mean(params, obs, cfg.activation, backend)

        @jax.jit
        def _sto(obs, key):
            a, _ = policy_mod.gaussian_sample(
                params, obs, key, cfg.activation, backend)
            return a

    def act(obs, key: Optional[jax.Array] = None):
        if norm is not None:
            obs = norm(obs)
        obs = jnp.asarray(obs, jnp.float32)
        single = obs.ndim == 1
        if single:
            obs = obs[None]
        if deterministic:
            out = _det(obs)
        else:
            if key is None:
                key_holder["key"], key = jax.random.split(key_holder["key"])
            out = _sto(obs, key)
        return out[0] if single else out

    act.cfg = cfg
    act.spec = spec
    return act


def load_recurrent_policy(path: str, deterministic: bool = True,
                          seed: int = 0):
    """Load a GRU-trunk checkpoint (models/gru.py) and return a stateful
    actor.

        act = ppoc_tpu.serve.load_recurrent_policy("model.bin")
        h = act.initial_state(batch_size)
        action, h = act(obs, h)           # [B, obs] -> ([B, act], [B, H])

    The caller owns the hidden state — zero it (``initial_state``) at every
    episode start.  One jitted device call per step, like load_policy.
    """
    from ppoc_tpu.models import gru, policy as policy_mod
    from ppoc_tpu.utils import checkpoint

    ck = checkpoint.load(path)
    if ck.cfg is None:
        raise ValueError(f"{path}: checkpoint has no embedded config")
    cfg = ck.cfg
    params = ck.state.policy_params
    if not gru.is_rnn(params["mlp"]):
        raise ValueError(
            f"{path} holds a feedforward policy; use serve.load_policy")
    discrete = ck.dims["discrete"]
    key_holder = {"key": jax.random.PRNGKey(seed)}

    @jax.jit
    def _step(obs, h, key):
        h2, out = gru.step(params["mlp"], h, obs, cfg.activation)
        action, _ = policy_mod.act_from_out(
            out, key, discrete, params.get("log_std"), deterministic)
        return action, h2

    def act(obs, h, key: Optional[jax.Array] = None):
        obs = jnp.asarray(obs, jnp.float32)
        single = obs.ndim == 1
        if single:
            obs = obs[None]
            h = h[None] if h.ndim == 1 else h
        if key is None:
            key_holder["key"], key = jax.random.split(key_holder["key"])
        a, h2 = _step(obs, h, key)
        return (a[0], h2[0]) if single else (a, h2)

    act.initial_state = lambda batch_size=None: gru.initial_state(
        params["mlp"], () if batch_size is None else (batch_size,))
    act.cfg = cfg
    # same actor-surface contract as load_policy (act.spec for consumers
    # that size buffers / check discreteness)
    from ppoc_tpu import envs as _envs
    from ppoc_tpu.envs.core import EnvSpec as _EnvSpec

    try:
        act.spec = _envs.make(cfg.env).spec
    except KeyError:
        act.spec = _EnvSpec(
            name=cfg.env, obs_dim=ck.dims["obs_dim"],
            action_dim=ck.dims["action_dim"], horizon=0, gamma=0.99,
            discrete=discrete,
        )
    return act
