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


# ---------------------------------------------------------------------------
# replicated fused phases under data parallelism (algo/ppo._fused_dp_ready)
# ---------------------------------------------------------------------------

def _dp_mesh(n):
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:n]), ("dp",))


def test_fused_dp_value_phase_bit_equals_single_device():
    """The dp value phase with the pallas backend must REPLICATE: one
    all_gather of the rows, the identical fused kernel on every shard under
    the shard-common key, results re-typed via pmax — BIT-equal to the
    single-device fused phase on the same global buffer."""
    from jax.sharding import PartitionSpec as P

    cfg = PPOConfig(env="pendulum", hidden=(16, 16), n_envs=8,
                    rollout_len=32, minibatch_size=32, n_epochs_value=2,
                    kernel_backend="pallas")
    env, ts, buf = _setup(cfg)
    k = jax.random.PRNGKey(7)
    v_ref, opt_ref, loss_ref = pallas_update.value_phase_fused(
        cfg, ts.v_params, ts.opt_v, buf, k)

    N = 4

    def local(ts_in, buf_local, k_common):
        # per-device key differs (as in the dp fit); key_common is shared
        k_dev = jax.random.fold_in(k_common, jax.lax.axis_index("dp"))
        ts2, loss = ppo.value_phase(
            cfg, ts_in, buf_local, k_dev, "dp", "pallas",
            cfg.num_minibatches, cfg.minibatch_size // N,
            key_common=k_common)
        return ts2, loss

    fn = jax.jit(jax.shard_map(
        local, mesh=_dp_mesh(N), in_specs=(P(), P("dp"), P()),
        out_specs=(P(), P()), check_vma=False))
    ts_dp, loss_dp = fn(ts, buf, k)
    for (a, ab), (b, bb) in zip(jax.device_get(v_ref),
                                jax.device_get(ts_dp.v_params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.array_equal(np.asarray(ab), np.asarray(bb))
    assert np.array_equal(np.asarray(loss_ref),
                          np.asarray(jax.device_get(loss_dp)))
    assert int(jax.device_get(ts_dp.opt_v.t)) == int(opt_ref.t)


def test_fused_dp_policy_phase_bit_equals_single_device():
    from jax.sharding import PartitionSpec as P

    cfg = PPOConfig(env="pendulum", hidden=(16, 16), n_envs=8,
                    rollout_len=32, minibatch_size=32, n_epochs_policy=2,
                    ent_coeff=0.01, kernel_backend="pallas")
    env, ts, buf = _setup(cfg)
    k = jax.random.PRNGKey(11)
    pol_ref, optp_ref, optl_ref, loss_ref, ent_ref = \
        pallas_update.policy_phase_fused(
            cfg, ts.policy_params, ts.opt_policy, ts.opt_log_std, buf, k)

    N = 4

    def local(ts_in, buf_local, k_common):
        k_dev = jax.random.fold_in(k_common, jax.lax.axis_index("dp"))
        ts2, loss, ent = ppo.policy_phase(
            cfg, env, ts_in, buf_local, k_dev, "dp", "pallas",
            cfg.num_minibatches, cfg.minibatch_size // N,
            key_common=k_common)
        return ts2, loss, ent

    fn = jax.jit(jax.shard_map(
        local, mesh=_dp_mesh(N), in_specs=(P(), P("dp"), P()),
        out_specs=(P(), P(), P()), check_vma=False))
    ts_dp, loss_dp, ent_dp = fn(ts, buf, k)
    for (a, _), (b, _b) in zip(jax.device_get(pol_ref["mlp"]),
                               jax.device_get(ts_dp.policy_params["mlp"])):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(pol_ref["log_std"]),
                          np.asarray(jax.device_get(
                              ts_dp.policy_params["log_std"])))
    assert np.array_equal(np.asarray(loss_ref),
                          np.asarray(jax.device_get(loss_dp)))
    assert np.array_equal(np.asarray(ent_ref),
                          np.asarray(jax.device_get(ent_dp)))


def test_fused_dp_trainer_epoch_runs_and_learns_shape():
    """Full dp Trainer epoch with kernel_backend='pallas': the fused
    replicated phases engage (ppo.fused_dp_engages) and the epoch produces
    finite metrics; the scan path still serves when a stabilizer is on."""
    import warnings

    from ppoc_tpu.algo.trainer import Trainer

    assert ppo.fused_dp_engages(
        PPOConfig(kernel_backend="pallas"), "pallas")
    assert not ppo.fused_dp_engages(
        PPOConfig(kernel_backend="pallas", max_grad_norm=0.5), "pallas")
    assert not ppo.fused_dp_engages(
        PPOConfig(kernel_backend="pallas", zero1=True), "pallas")

    cfg = PPOConfig(env="pendulum", hidden=(16, 16), n_envs=8,
                    rollout_len=32, minibatch_size=32, fits_per_epoch=2,
                    n_epochs_value=2, n_epochs_policy=2, eval_envs=8,
                    eval_len=16, kernel_backend="pallas", seed=0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tr = Trainer(cfg, mesh=_dp_mesh(4))
    m = jax.tree.map(float, jax.device_get(tr.train_epoch()))
    assert np.isfinite(m.value_loss) and np.isfinite(m.policy_loss)


def test_pallas_dp_outside_fused_regime_scans(monkeypatch):
    """dp + pallas with a stabilizer ON (fused gates closed) must fall back
    to the scan path and TRAIN — previously the shard_map was built with
    the vma checker whenever the fused gate was closed, and the scan path's
    pallas MLP forward failed to trace (review r4 finding #1: the pallas
    backend reaches kernels on EVERY dp path, so check_vma must drop for
    the whole mode)."""
    import warnings

    from ppoc_tpu.algo.trainer import Trainer

    cfg = PPOConfig(env="pendulum", hidden=(16, 16), n_envs=8,
                    rollout_len=32, minibatch_size=32, fits_per_epoch=1,
                    n_epochs_value=2, n_epochs_policy=2, eval_envs=8,
                    eval_len=16, kernel_backend="pallas",
                    max_grad_norm=0.5, seed=0)
    assert not ppo.fused_dp_engages(cfg, "pallas")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tr = Trainer(cfg, mesh=_dp_mesh(4))
    assert tr._dp_check_vma is False  # whole pallas-dp mode drops the checker
    m = jax.tree.map(float, jax.device_get(tr.train_epoch()))
    assert np.isfinite(m.value_loss) and np.isfinite(m.policy_loss)
