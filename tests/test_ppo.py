"""End-to-end PPO behavior: learning smoke tests, eval metrics, rollout
semantics, checkpoint round-trip.  The simple_env smoke mirrors the
reference's de-facto integration test (SURVEY.md §4)."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu import PPOConfig, envs
from ppoc_tpu.algo import ppo
from ppoc_tpu.algo.trainer import Trainer


def small_cfg(**kw):
    base = dict(
        env="simple", n_envs=32, rollout_len=15, minibatch_size=64,
        fits_per_epoch=5, n_epochs=3, eval_envs=64, eval_len=15,
        kernel_backend="jnp", hidden=(32, 32), seed=0,
    )
    base.update(kw)
    return PPOConfig(**base)


def test_rollout_force_truncates_window_end():
    """src/ppo.cu:70-74: last step truncated unless terminated."""
    cfg = small_cfg()
    env = envs.make("simple")
    key = jax.random.PRNGKey(0)
    ts = ppo.init_train_state(cfg, env, key)
    traj, _ = ppo.rollout(cfg, env, ts.policy_params, key, 8, 7, "jnp")
    last_done = np.asarray(traj.terminated[-1] | traj.truncated[-1])
    assert last_done.all()


def test_rollout_shapes_and_logprob_consistency():
    cfg = small_cfg()
    env = envs.make("pendulum")
    key = jax.random.PRNGKey(0)
    ts = ppo.init_train_state(cfg, env, key)
    traj, _ = ppo.rollout(cfg, env, ts.policy_params, key, 4, 10, "jnp")
    assert traj.obs.shape == (10, 4, 3)
    assert traj.action.shape == (10, 4, 1)
    # stored log-probs match recomputation from stored (obs, action)
    from ppoc_tpu.models import policy as P
    lp = P.gaussian_log_prob(
        ts.policy_params, traj.obs.reshape(40, 3), traj.action.reshape(40, 1),
        "relu", "jnp",
    )
    np.testing.assert_allclose(
        np.asarray(traj.log_prob).reshape(40), np.asarray(lp), rtol=1e-4, atol=1e-5
    )


def test_learns_simple_env():
    tr = Trainer(small_cfg(n_epochs=4))
    hist = tr.train(log=False)
    assert hist[-1]["R"] > 0.5, f"failed to learn: {[h['R'] for h in hist]}"
    assert hist[-1]["R"] > hist[0]["R"] - 0.05


def test_learns_cartpole_smoke():
    cfg = small_cfg(env="cartpole", n_envs=32, rollout_len=64, eval_len=200,
                    eval_envs=16, fits_per_epoch=4, n_epochs=4)
    tr = Trainer(cfg)
    hist = tr.train(log=False)
    # untrained ~ 20-30 per episode; learning should push mean episode length up
    assert hist[-1]["R"] > hist[0]["R"] + 5, [h["R"] for h in hist]


def test_eval_metrics_pendulum_range():
    cfg = small_cfg(env="pendulum", eval_envs=8, eval_len=200)
    env = envs.make("pendulum")
    key = jax.random.PRNGKey(0)
    ts = ppo.init_train_state(cfg, env, key)
    m = jax.jit(lambda p, k: ppo.evaluate(cfg, env, p, k))(ts.policy_params, key)
    assert int(m.episodes) == 8            # one 200-step episode per env
    assert -2500 < float(m.R) < 0          # pendulum cost range
    assert float(m.J) > float(m.R) * 1.01  # discounting shrinks magnitude... loosely
    assert float(m.J) < 0


def test_eval_counts_multiple_episodes_per_env():
    cfg = small_cfg(env="simple", eval_envs=4, eval_len=45)
    env = envs.make("simple")
    key = jax.random.PRNGKey(0)
    ts = ppo.init_train_state(cfg, env, key)
    m = ppo.evaluate(cfg, env, ts.policy_params, key)
    # 45 steps / horizon 15 -> at least 3 episodes per env
    assert int(m.episodes) >= 12


def test_checkpoint_roundtrip_resumes_bitexact():
    cfg = small_cfg(n_epochs=1)
    tr = Trainer(cfg)
    tr.train(log=False)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ckpt.ppoc")
        tr.save(p)
        tr2 = Trainer(cfg)
        tr2.load(p)
        for a, b in zip(
            jax.tree.leaves(tr.state), jax.tree.leaves(tr2.state)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_seed_determinism():
    cfg = small_cfg(n_epochs=1)
    h1 = Trainer(cfg).train(log=False)
    h2 = Trainer(cfg).train(log=False)
    assert h1[0]["R"] == h2[0]["R"] and h1[0]["value_loss"] == h2[0]["value_loss"]


def test_advantage_normalization_whole_buffer():
    cfg = small_cfg()
    env = envs.make("pendulum")
    key = jax.random.PRNGKey(0)
    ts = ppo.init_train_state(cfg, env, key)
    traj, _ = ppo.rollout(cfg, env, ts.policy_params, key, 8, 50, "jnp")
    adv, target = ppo.compute_advantages(cfg, env, ts.v_params, traj, None, "jnp")
    assert abs(float(adv.mean())) < 1e-5
    np.testing.assert_allclose(float(adv.std()), 1.0, atol=1e-3)


def test_reset_per_fit_false_persists_env_state():
    """With reset_per_fit=False, episodes continue across fits within an
    epoch: on a long-horizon env with short windows, later windows must
    reach env step-counts beyond one window length (impossible with
    per-fit resets)."""
    from ppoc_tpu import envs as envs_mod
    from ppoc_tpu.config import PPOConfig

    cfg = PPOConfig(env="pendulum", n_envs=4, rollout_len=25, minibatch_size=20,
                    fits_per_epoch=3, n_epochs_value=1, n_epochs_policy=1,
                    hidden=(16, 16), reset_per_fit=False)
    env = envs_mod.make(cfg.env)
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))

    # thread the carry manually through two fits and inspect the step counter
    key = jax.random.PRNGKey(1)
    carry = envs_mod.vector_reset(env, key, cfg.n_envs)
    ts, carry, _ = ppo.fit_step(cfg, env, ts, jax.random.fold_in(key, 0),
                                env_carry=carry, return_env_carry=True)
    state_after_1, _ = carry
    assert int(jnp.max(state_after_1.t)) == 25  # pendulum never terminates
    ts, carry, _ = ppo.fit_step(cfg, env, ts, jax.random.fold_in(key, 1),
                                env_carry=carry, return_env_carry=True)
    state_after_2, _ = carry
    assert int(jnp.max(state_after_2.t)) == 50  # continued, not reset

    # and the full train_epoch path runs + learns finitely
    ts2, metrics = jax.jit(
        lambda ts, k: ppo.train_epoch(cfg, env, ts, k)
    )(ts, jax.random.fold_in(key, 2))
    assert bool(jnp.isfinite(metrics.value_loss))


def test_eval_metrics_exclude_windowcut_episodes():
    """Episodes cut by the eval window end must not count (they'd deflate R
    for envs whose horizon exceeds eval_len, e.g. CartPole 500 vs 200)."""
    T, E = 6, 1
    z = jnp.zeros((T, E))
    reward = jnp.asarray([[1.0], [1.0], [1.0], [5.0], [5.0], [5.0]])
    # one complete 3-step episode, then a trailing uncompleted segment
    terminated = jnp.asarray([[False], [False], [True], [False], [False], [False]])
    traj = ppo.Transition(
        obs=jnp.zeros((T, E, 2)), action=jnp.zeros((T, E, 1)), log_prob=z,
        next_obs=jnp.zeros((T, E, 2)), reward=reward,
        terminated=terminated, truncated=jnp.zeros((T, E), bool),
    )
    m = ppo.eval_metrics_from_traj(traj, gamma=1.0)
    assert float(m.episodes) == 1.0
    assert float(m.R) == 3.0  # only the completed episode; not 3+15


def test_eval_metrics_zero_completed_episodes():
    """No completed episode => episodes=0 and R = J = -inf (NOT 0, which for
    negative-return envs would read as instantly solved; ADVICE r1 #1)."""
    T, E = 4, 2
    traj = ppo.Transition(
        obs=jnp.zeros((T, E, 2)), action=jnp.zeros((T, E, 1)),
        log_prob=jnp.zeros((T, E)),
        next_obs=jnp.zeros((T, E, 2)), reward=jnp.ones((T, E)),
        terminated=jnp.zeros((T, E), bool), truncated=jnp.zeros((T, E), bool),
    )
    m = ppo.eval_metrics_from_traj(traj, gamma=0.99)
    assert float(m.episodes) == 0.0
    assert float(m.R) == -np.inf and float(m.J) == -np.inf
    assert not np.isnan(float(m.R)) and not np.isnan(float(m.J))


def test_deterministic_evaluate():
    """evaluate(deterministic=True) rolls out the policy MODE: for a fixed
    key the trajectory is reproducible and actions equal the MLP forward
    (Gaussian) / argmax (categorical); works on single device and mesh."""
    import jax.numpy as jnp

    from ppoc_tpu import envs
    from ppoc_tpu.algo import ppo as ppo_mod
    from ppoc_tpu.algo.trainer import Trainer
    from ppoc_tpu.models import mlp, policy as policy_mod

    cfg = PPOConfig(env="pendulum", n_envs=8, rollout_len=32,
                    minibatch_size=32, fits_per_epoch=1, eval_envs=8,
                    eval_len=200, hidden=(16, 16), kernel_backend="jnp",
                    seed=0)
    env = envs.make("pendulum")
    params = policy_mod.init(jax.random.PRNGKey(0), 3, 1, (16, 16), 1.0, False)

    # mode == forward mean for Gaussian
    obs = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    a, lp = policy_mod.mode(params, obs, "relu", "jnp", False)
    np.testing.assert_array_equal(
        np.asarray(a), np.asarray(mlp.apply(params["mlp"], obs, "relu", "jnp")))
    assert np.isfinite(np.asarray(lp)).all()

    # deterministic rollout: same key -> identical trajectory; the action
    # stream has zero sampling noise (same obs -> same action)
    traj1, _ = ppo_mod.rollout(cfg, env, params, jax.random.PRNGKey(2), 8, 32,
                               "jnp", deterministic=True, force_truncate=False)
    traj2, _ = ppo_mod.rollout(cfg, env, params, jax.random.PRNGKey(2), 8, 32,
                               "jnp", deterministic=True, force_truncate=False)
    np.testing.assert_array_equal(np.asarray(traj1.action),
                                  np.asarray(traj2.action))

    # Trainer surface, single device and dp mesh
    tr = Trainer(cfg)
    m = tr.evaluate(deterministic=True)
    assert np.isfinite(m.R) and m.episodes > 0

    from ppoc_tpu.parallel import make_mesh
    tr8 = Trainer(PPOConfig(env="pendulum", n_envs=16, rollout_len=32,
                            minibatch_size=32, fits_per_epoch=1,
                            eval_envs=16, eval_len=200, hidden=(16, 16),
                            kernel_backend="jnp", seed=0), mesh=make_mesh())
    m8 = tr8.evaluate(deterministic=True)
    assert np.isfinite(m8.R) and m8.episodes > 0

    # categorical mode = argmax
    cparams = policy_mod.init(jax.random.PRNGKey(3), 4, 3, (16,), 1.0, True)
    cobs = jax.random.normal(jax.random.PRNGKey(4), (6, 4))
    ca, clp = policy_mod.mode(cparams, cobs, "relu", "jnp", True)
    logits = mlp.apply(cparams["mlp"], cobs, "relu", "jnp")
    np.testing.assert_array_equal(
        np.asarray(ca)[:, 0], np.asarray(jnp.argmax(logits, axis=-1)))
