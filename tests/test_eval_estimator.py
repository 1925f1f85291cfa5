"""The strict reference eval estimator (PPOConfig.eval_estimator="reference").

Reproduces the reference's eval_ppo loop exactly (src/ppo.cu:560-583):
n_episodes starts at 1 (window-cut segment counted), the backward J walk
accumulates BEFORE the done check (mixing the earlier episode's final
reward into the later episode's J), and the chronologically first
segment's J is never summed.  Pinned here against a line-by-line Python
transliteration of the C loop, plus the behavioral contrasts with the
default completed-episodes estimator.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu.algo import ppo
from ppoc_tpu.algo.trainer import Trainer
from ppoc_tpu.config import PPOConfig, validate


def _ref_eval_c_loop(rewards, dones, gamma):
    """Line-by-line transliteration of eval_ppo (src/ppo.cu:566-579) on one
    stream: returns (sum_J, total_reward, n_episodes)."""
    T = len(rewards)
    total = float(rewards[T - 1])
    episode_J = float(rewards[T - 1])
    n_episodes = 1
    sum_J = 0.0
    for i in range(T - 2, -1, -1):
        total += float(rewards[i])
        episode_J = float(rewards[i]) + gamma * episode_J
        if dones[i]:
            n_episodes += 1
            sum_J += episode_J
            episode_J = 0.0
    return sum_J, total, n_episodes


def _traj(rewards, dones):
    """Minimal [T, E] Transition carrying only what the estimators read."""
    r = jnp.asarray(rewards, jnp.float32)
    d = jnp.asarray(dones, bool)
    z = jnp.zeros(r.shape + (1,), jnp.float32)
    return ppo.Transition(obs=z, action=z, log_prob=r * 0, next_obs=z,
                          reward=r, terminated=d,
                          truncated=jnp.zeros_like(d))


def test_reference_estimator_matches_c_loop():
    """eval_metrics_reference == the transliterated C loop, pooled over env
    streams, on an adversarial pattern: interior dones, a window-cut tail,
    a done at the final step, and an all-cut column."""
    rng = np.random.default_rng(7)
    T, E, gamma = 13, 3, 0.97
    rewards = rng.normal(size=(T, E)).astype(np.float32)
    dones = np.zeros((T, E), bool)
    dones[4, 0] = dones[9, 0] = True          # two interior episodes + cut tail
    dones[T - 1, 1] = True                    # completes exactly at window end
    dones[6, 1] = True
    # column 2: no done at all (everything window-cut)
    sum_j = tot = n = 0.0
    for e in range(E):
        sj, t, ne = _ref_eval_c_loop(rewards[:, e], dones[:, e], gamma)
        sum_j += sj
        tot += t
        n += ne
    m = jax.device_get(ppo.eval_metrics_reference(_traj(rewards, dones), gamma))
    assert float(m.episodes) == n
    np.testing.assert_allclose(float(m.J), sum_j / n, rtol=1e-5)
    np.testing.assert_allclose(float(m.R), tot / n, rtol=1e-5)


def test_reference_estimator_quirks_pinned():
    """The two reference quirks, pinned by construction: (a) each recorded
    J mixes the earlier episode's last reward in (accumulate-then-check);
    (b) the first segment's J is dropped."""
    gamma = 0.5
    # one stream: episode A = steps 0..2 (done at 2), episode B = steps 3..4
    # (done at 4), then a cut tail at step 5
    rewards = np.array([[1.0], [2.0], [4.0], [8.0], [16.0], [32.0]])
    dones = np.zeros((6, 1), bool)
    dones[2, 0] = dones[4, 0] = True
    m = jax.device_get(ppo.eval_metrics_reference(_traj(rewards, dones), gamma))
    # walk: ep_J seeds at 32; i=4: 16+.5*32=32 -> done: record 32 (B's J
    # CONTAMINATED by the tail); i=3: 8; i=2: 4+.5*8=8 -> done: record 8
    # (A's last reward + gamma*B-start, NOT A's own J); i=1,0 accumulate
    # A's J=2.5 but never sum it (dropped oldest)
    assert float(m.episodes) == 3.0          # 2 interior dones + the cut tail
    np.testing.assert_allclose(float(m.J), (32.0 + 8.0) / 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(m.R), 63.0 / 3.0, rtol=1e-6)


def test_estimators_agree_on_pendulum_R():
    """On Pendulum (horizon == eval window, every episode truncates exactly
    at the window end) the two estimators report the SAME R — the measured
    round-2 'deviation exactly zero' claim, now as a test."""
    cfg = PPOConfig(env="pendulum", n_envs=4, rollout_len=50,
                    minibatch_size=50, fits_per_epoch=1, eval_envs=4,
                    eval_len=200, kernel_backend="jnp", hidden=(16,), seed=0)
    tr = Trainer(cfg)
    r_completed = tr.evaluate().R
    tr2 = Trainer(cfg.replace(eval_estimator="reference"))
    r_reference = tr2.evaluate().R
    np.testing.assert_allclose(r_completed, r_reference, rtol=1e-5)


def test_reference_counts_window_cut_segments():
    """envs whose horizon exceeds the eval window: the completed estimator
    reports -inf (no episode finishes — the honest answer), the reference
    estimator divides by the cut segments and reports a finite partial R
    (the deflation the default exists to fix)."""
    cfg = PPOConfig(env="simple", n_envs=4, rollout_len=15,
                    minibatch_size=30, fits_per_epoch=1, eval_envs=4,
                    eval_len=10,  # simple env horizon is 15: nothing finishes
                    kernel_backend="jnp", hidden=(8,), seed=0)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m_completed = Trainer(cfg).evaluate()
        m_reference = Trainer(
            cfg.replace(eval_estimator="reference")).evaluate()
    assert m_completed.episodes == 0 and m_completed.R == -np.inf
    assert m_reference.episodes == 4.0           # one cut segment per env
    assert np.isfinite(m_reference.R)


def test_validate_rejects_unknown_estimator():
    with pytest.raises(ValueError, match="eval_estimator"):
        validate(PPOConfig(eval_estimator="mean"))


def test_train_until_runs_under_reference_estimator():
    """solve()/stop_at_R consume the configured estimator inside the jitted
    while-loop program."""
    cfg = PPOConfig(env="pendulum", n_envs=8, rollout_len=25,
                    minibatch_size=100, fits_per_epoch=1, eval_envs=8,
                    eval_len=200, kernel_backend="jnp", hidden=(16,),
                    seed=0, eval_estimator="reference")
    res = Trainer(cfg).solve(target_R=-1e9, max_epochs=1)
    assert res["epochs"] == 1 and np.isfinite(res["R"])
