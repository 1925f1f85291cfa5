"""Gymnasium host bridge: rollout semantics + learner integration.

The bridge reproduces the reference's actor/learner split (CPU rollouts into
the device update, src/ppo.cu:479-539).  Checks: window force-truncation,
true-successor next_obs across auto-resets, log-prob consistency, and a
short end-to-end GymTrainer run on Pendulum-v1 driving ppo.update_step.
"""
import numpy as np
import pytest

pytest.importorskip("gymnasium")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ppoc_tpu.algo import ppo  # noqa: E402
from ppoc_tpu.config import PPOConfig  # noqa: E402
from ppoc_tpu.envs.gym_bridge import GymTrainer, GymVecEnv, collect_host  # noqa: E402
from ppoc_tpu.models import policy as policy_mod  # noqa: E402


def _cfg(**kw):
    base = dict(env="pendulum", n_envs=4, rollout_len=64, minibatch_size=32,
                fits_per_epoch=1, n_epochs=1, eval_envs=4, eval_len=64,
                hidden=(32, 32), kernel_backend="jnp", seed=0)
    base.update(kw)
    return PPOConfig(**base)


def test_spec_from_gym():
    venv = GymVecEnv("Pendulum-v1", 2)
    assert venv.spec.obs_dim == 3
    assert venv.spec.action_dim == 1
    assert venv.spec.horizon == 200
    assert not venv.spec.discrete
    venv.close()


def test_reference_env_id_table():
    venv = GymVecEnv(0, 1)  # id 0 = Pendulum-v1 (scripts/gym_env.py:11-13)
    assert venv.spec.name == "gym:Pendulum-v1"
    venv.close()


def test_collect_window_semantics():
    cfg = _cfg()
    venv = GymVecEnv("Pendulum-v1", cfg.n_envs, seed=0)
    params = policy_mod.init(jax.random.PRNGKey(0), 3, 1, cfg.hidden, 1.0, False)
    traj, _ = collect_host(cfg, venv, params, jax.random.PRNGKey(1), cfg.rollout_len)
    assert traj.obs.shape == (cfg.rollout_len, cfg.n_envs, 3)
    # window end force-truncated (src/ppo.cu:70-74)
    last_done = np.asarray(traj.terminated[-1] | traj.truncated[-1])
    assert last_done.all()
    # stored log-probs match recomputation under the same params
    lp = policy_mod.log_prob(params, traj.obs, traj.action, "relu", "jnp", False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(traj.log_prob),
                               rtol=1e-4, atol=1e-4)
    venv.close()


def test_next_obs_is_true_successor():
    """Where no reset happened, next_obs must equal the following obs."""
    cfg = _cfg(rollout_len=32)
    venv = GymVecEnv("Pendulum-v1", cfg.n_envs, seed=1)
    params = policy_mod.init(jax.random.PRNGKey(0), 3, 1, cfg.hidden, 1.0, False)
    traj, _ = collect_host(cfg, venv, params, jax.random.PRNGKey(2), cfg.rollout_len)
    done = np.asarray(traj.terminated | traj.truncated)
    nxt = np.asarray(traj.next_obs)[:-1]
    obs_next_step = np.asarray(traj.obs)[1:]
    keep = ~done[:-1]
    np.testing.assert_allclose(nxt[keep], obs_next_step[keep], rtol=1e-6)
    venv.close()


def test_gym_trainer_end_to_end():
    # eval_len >= the env horizon (200) so episodes can complete — eval
    # counts only completed episodes (ppo.eval_metrics_from_traj)
    cfg = _cfg(eval_len=200, eval_envs=2)
    tr = GymTrainer(cfg, "Pendulum-v1")
    m0 = tr.evaluate()
    hist = tr.train(n_epochs=1, log=False)
    assert len(hist) == 1
    assert np.isfinite(hist[0]["R"]) and np.isfinite(hist[0]["entropy"])
    assert m0.episodes > 0


def test_host_policy_matches_device_policy():
    """The numpy host actor (HostPolicy) must mirror the device policy: same
    mean forward, same log-prob for the same actions."""
    from ppoc_tpu.envs.host import HostPolicy

    params = policy_mod.init(jax.random.PRNGKey(5), 3, 2, (32, 32), 0.7, False)
    hp = HostPolicy(params, "relu", False)
    obs = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)

    mu_host = hp.forward(obs)
    mu_dev = np.asarray(policy_mod.gaussian_mean(params, jnp.asarray(obs), "relu", "jnp"))
    np.testing.assert_allclose(mu_host, mu_dev, rtol=1e-5, atol=1e-6)

    a, lp_host = hp.sample(obs, np.random.default_rng(1))
    lp_dev = np.asarray(policy_mod.log_prob(
        params, jnp.asarray(obs), jnp.asarray(a), "relu", "jnp", False))
    np.testing.assert_allclose(lp_host, lp_dev, rtol=1e-4, atol=1e-5)


def test_host_policy_categorical_matches_device():
    from ppoc_tpu.envs.host import HostPolicy

    params = policy_mod.init(jax.random.PRNGKey(6), 4, 3, (16,), 1.0, True)
    hp = HostPolicy(params, "relu", True)
    obs = np.random.default_rng(2).normal(size=(256, 4)).astype(np.float32)
    a, lp_host = hp.sample(obs, np.random.default_rng(3))
    assert a.shape == (256, 1) and a.dtype == np.int32
    lp_dev = np.asarray(policy_mod.log_prob(
        params, jnp.asarray(obs), jnp.asarray(a), "relu", "jnp", True))
    np.testing.assert_allclose(lp_host, lp_dev, rtol=1e-4, atol=1e-5)
    # empirical action frequencies track softmax probabilities
    logits = hp.forward(obs)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    freq = np.bincount(a[:, 0], minlength=3) / 256
    np.testing.assert_allclose(freq, p.mean(0), atol=0.12)


def test_host_actor_rollout_semantics():
    """collect_host_np: window force-truncation + stored log-probs match a
    device recomputation under the same params."""
    from ppoc_tpu.envs.host import HostPolicy, collect_host_np

    cfg = _cfg()
    venv = GymVecEnv("Pendulum-v1", cfg.n_envs, seed=0)
    params = policy_mod.init(jax.random.PRNGKey(0), 3, 1, cfg.hidden, 1.0, False)
    pol = HostPolicy(params, "relu", False)
    traj, last_obs = collect_host_np(
        cfg, venv, pol, np.random.default_rng(0), cfg.rollout_len)
    assert traj.obs.shape == (cfg.rollout_len, cfg.n_envs, 3)
    assert last_obs.shape == (cfg.n_envs, 3)
    last_done = np.asarray(traj.terminated[-1] | traj.truncated[-1])
    assert last_done.all()
    lp = policy_mod.log_prob(params, traj.obs, traj.action, "relu", "jnp", False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(traj.log_prob),
                               rtol=1e-4, atol=1e-4)
    venv.close()


def test_gym_trainer_host_actor_end_to_end():
    """GymTrainer(actor='host'): zero-device-round-trip rollouts feed the
    jitted learner; one epoch runs and the policy updates."""
    cfg = _cfg(eval_len=200, eval_envs=2)
    tr = GymTrainer(cfg, "Pendulum-v1", actor="host")
    w0 = np.asarray(jax.device_get(tr.state.policy_params["mlp"][0][0]))
    hist = tr.train(n_epochs=1, log=False)
    w1 = np.asarray(jax.device_get(tr.state.policy_params["mlp"][0][0]))
    assert np.isfinite(hist[0]["R"]) and np.isfinite(hist[0]["entropy"])
    assert np.abs(w1 - w0).max() > 0  # learner consumed the host rollouts


def test_gym_vec_env_async_mode():
    """AsyncVectorEnv path: same protocol, worker-process stepping."""
    venv = GymVecEnv("Pendulum-v1", 2, seed=0, vector_mode="async")
    obs = venv.reset()
    assert obs.shape == (2, 3)
    a = np.zeros((2, 1), np.float32)
    obs_after, next_obs, reward, term, trunc = venv.step(a)
    assert obs_after.shape == (2, 3) and next_obs.shape == (2, 3)
    assert reward.shape == (2,)
    venv.close()


def test_gym_trainer_obs_norm_end_to_end():
    """GymTrainer(obs_norm=True): running-normalized observations feed the
    learner; the eval venv shares (but never writes) the statistics."""
    cfg = _cfg(eval_len=200, eval_envs=2)
    tr = GymTrainer(cfg, "Pendulum-v1", actor="host", obs_norm=True)
    assert tr.venv.stats is tr.eval_venv.stats
    assert tr.venv.update and not tr.eval_venv.update
    hist = tr.train(n_epochs=1, log=False)
    assert np.isfinite(hist[0]["R"])
    # statistics actually accumulated from the rollouts
    assert tr.venv.stats.count >= cfg.n_envs * cfg.rollout_len
    assert np.all(tr.venv.stats.variance() > 0)
