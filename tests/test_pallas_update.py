"""Fused update-phase kernel vs the generic scan path.

The whole-phase kernel (ops/pallas_update.py: forward + backward + Adam for
every epoch x minibatch in one pallas_call, weights/moments VMEM-resident)
must reproduce algo.ppo.value_phase exactly: same permutation stream, same
Adam timestep sequence, same final weights to float-reduction noise.  Runs
in interpret mode on CPU (the same code path compiles on TPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu import PPOConfig, envs
from ppoc_tpu.algo import ppo
from ppoc_tpu.data import buffer
from ppoc_tpu.ops import pallas_update


def _setup(cfg, seed=0):
    env = envs.make(cfg.env)
    key = jax.random.PRNGKey(seed)
    ts = ppo.init_train_state(cfg, env, key)
    traj, _ = ppo.rollout(cfg, env, ts.policy_params, key,
                          cfg.n_envs, cfg.rollout_len, "jnp")
    adv, tgt = ppo.compute_advantages(cfg, env, ts.v_params, traj, None, "jnp")
    return env, ts, buffer.from_rollout(traj, adv, tgt)


@pytest.mark.parametrize("mb,hidden", [(64, (32, 32)), (96, (16, 16, 16))])
def test_fused_value_phase_matches_scan(mb, hidden):
    cfg = PPOConfig(env="pendulum", n_envs=8, rollout_len=48,
                    minibatch_size=mb, n_epochs_value=3, hidden=hidden,
                    kernel_backend="jnp")
    env, ts, buf = _setup(cfg)
    k = jax.random.PRNGKey(7)

    ts_ref, loss_ref = ppo.value_phase(
        cfg, ts, buf, k, None, "jnp", cfg.num_minibatches, cfg.minibatch_size)
    p2, o2, loss2 = jax.jit(
        lambda vp, ov, key: pallas_update.value_phase_fused(cfg, vp, ov, buf, key)
    )(ts.v_params, ts.opt_v, k)

    assert float(loss_ref) == pytest.approx(float(loss2), rel=1e-5)
    for (a, ab), (b, bb) in zip(jax.device_get(ts_ref.v_params),
                                jax.device_get(p2)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ab), bb, rtol=1e-4, atol=1e-6)
    assert int(ts_ref.opt_v.t) == int(o2.t)
    for x, y in zip(jax.tree.leaves(jax.device_get(ts_ref.opt_v.v)),
                    jax.tree.leaves(jax.device_get(o2.v))):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-7)


def test_fused_value_phase_subtiling():
    """Minibatch larger than the VMEM tile cap: sub-tile accumulation must
    give the same result as one full-batch gradient."""
    cfg = PPOConfig(env="pendulum", n_envs=32, rollout_len=64,
                    minibatch_size=512, n_epochs_value=2, hidden=(32, 32),
                    kernel_backend="jnp")
    env, ts, buf = _setup(cfg)
    k = jax.random.PRNGKey(3)
    ts_ref, loss_ref = ppo.value_phase(
        cfg, ts, buf, k, None, "jnp", cfg.num_minibatches, cfg.minibatch_size)

    old_cap = pallas_update._MAX_TILE
    pallas_update._MAX_TILE = 128   # force 4 sub-tiles per minibatch
    try:
        p2, o2, loss2 = jax.jit(
            lambda vp, ov, key: pallas_update.value_phase_fused(
                cfg, vp, ov, buf, key)
        )(ts.v_params, ts.opt_v, k)
    finally:
        pallas_update._MAX_TILE = old_cap
    assert float(loss_ref) == pytest.approx(float(loss2), rel=1e-5)
    for (a, ab), (b, bb) in zip(jax.device_get(ts_ref.v_params),
                                jax.device_get(p2)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4, atol=1e-6)


def test_pallas_backend_update_step_uses_fused_phase():
    """update_step with backend='pallas' single-device must agree with the
    jnp backend end to end (rollout data identical, phases numerically
    equivalent)."""
    cfg = PPOConfig(env="pendulum", n_envs=8, rollout_len=32,
                    minibatch_size=64, n_epochs_value=2, n_epochs_policy=2,
                    hidden=(32, 32), kernel_backend="jnp")
    env, ts, buf = _setup(cfg)
    traj, _ = ppo.rollout(cfg, env, ts.policy_params, jax.random.PRNGKey(1),
                          cfg.n_envs, cfg.rollout_len, "jnp")
    k = jax.random.PRNGKey(9)
    ts_j, m_j = jax.jit(lambda t: ppo.update_step(
        cfg, env, t, traj, k, backend="jnp"))(ts)
    ts_p, m_p = jax.jit(lambda t: ppo.update_step(
        cfg, env, t, traj, k, backend="pallas"))(ts)
    assert float(m_j.value_loss) == pytest.approx(float(m_p.value_loss), rel=1e-4)
    for (a, _), (b, _) in zip(jax.device_get(ts_j.v_params),
                              jax.device_get(ts_p.v_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("ent_coeff", [0.0, 0.01])
def test_fused_policy_phase_matches_scan(ent_coeff):
    cfg = PPOConfig(env="pendulum", n_envs=8, rollout_len=48,
                    minibatch_size=64, n_epochs_policy=3, hidden=(32, 32),
                    ent_coeff=ent_coeff, kernel_backend="jnp")
    env, ts, buf = _setup(cfg)
    k = jax.random.PRNGKey(11)
    ts_r, loss_r, ent_r = ppo.policy_phase(
        cfg, env, ts, buf, k, None, "jnp",
        cfg.num_minibatches, cfg.minibatch_size)
    ts_p, loss_p, ent_p = jax.jit(lambda t: ppo.policy_phase(
        cfg, env, t, buf, k, None, "pallas",
        cfg.num_minibatches, cfg.minibatch_size))(ts)
    assert float(loss_r) == pytest.approx(float(loss_p), abs=1e-5)
    assert float(ent_r) == pytest.approx(float(ent_p), rel=1e-5)
    for (a, ab), (b, bb) in zip(jax.device_get(ts_r.policy_params["mlp"]),
                                jax.device_get(ts_p.policy_params["mlp"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ab), np.asarray(bb),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ts_r.policy_params["log_std"]),
        np.asarray(ts_p.policy_params["log_std"]), rtol=1e-5, atol=1e-7)
    assert int(ts_r.opt_policy.t) == int(ts_p.opt_policy.t)
    assert int(ts_r.opt_log_std.t) == int(ts_p.opt_log_std.t)


def test_fused_phases_multi_action_dim():
    """action_dim > 1 (the reference's CUDA logprob kernel was broken here,
    src/policy.cu:113-125 — ours must not be)."""
    cfg = PPOConfig(env="reacher", n_envs=8, rollout_len=32,
                    minibatch_size=64, n_epochs_policy=2, n_epochs_value=2,
                    hidden=(32, 32), kernel_backend="jnp")
    env, ts, buf = _setup(cfg)
    k = jax.random.PRNGKey(5)
    ts_r, loss_r, ent_r = ppo.policy_phase(
        cfg, env, ts, buf, k, None, "jnp",
        cfg.num_minibatches, cfg.minibatch_size)
    ts_p, loss_p, ent_p = jax.jit(lambda t: ppo.policy_phase(
        cfg, env, t, buf, k, None, "pallas",
        cfg.num_minibatches, cfg.minibatch_size))(ts)
    assert float(loss_r) == pytest.approx(float(loss_p), abs=1e-5)
    np.testing.assert_allclose(
        np.asarray(ts_r.policy_params["log_std"]),
        np.asarray(ts_p.policy_params["log_std"]), rtol=1e-4, atol=1e-6)
    for (a, _), (b, _) in zip(jax.device_get(ts_r.policy_params["mlp"]),
                              jax.device_get(ts_p.policy_params["mlp"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("env_name,ent_coeff", [("cartpole", 0.0),
                                                ("acrobot", 0.01)])
def test_fused_categorical_policy_phase_matches_scan(env_name, ent_coeff):
    """Discrete policies get the fused phase too (the reference has no
    discrete path at all); softmax + entropy-bonus gradients must match
    autodiff of the generic loss."""
    cfg = PPOConfig(env=env_name, n_envs=8, rollout_len=48,
                    minibatch_size=64, n_epochs_policy=3, hidden=(32, 32),
                    ent_coeff=ent_coeff, kernel_backend="jnp")
    env, ts, buf = _setup(cfg)
    k = jax.random.PRNGKey(13)
    ts_r, loss_r, ent_r = ppo.policy_phase(
        cfg, env, ts, buf, k, None, "jnp",
        cfg.num_minibatches, cfg.minibatch_size)
    ts_p, loss_p, ent_p = jax.jit(lambda t: ppo.policy_phase(
        cfg, env, t, buf, k, None, "pallas",
        cfg.num_minibatches, cfg.minibatch_size))(ts)
    assert float(loss_r) == pytest.approx(float(loss_p), abs=1e-5)
    assert float(ent_r) == pytest.approx(float(ent_p), rel=1e-4)
    for (a, ab), (b, bb) in zip(jax.device_get(ts_r.policy_params["mlp"]),
                                jax.device_get(ts_p.policy_params["mlp"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ab), np.asarray(bb),
                                   rtol=1e-4, atol=1e-6)
    assert int(ts_r.opt_policy.t) == int(ts_p.opt_policy.t)
