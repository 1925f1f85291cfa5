"""Whole-rollout Pallas kernel vs the generic scan rollout.

The one-kernel actor loop (ops/pallas_rollout.py) must reproduce the scan
path's SEMANTICS exactly — physics, log-prob bookkeeping, truncation and
auto-reset, carry continuation — while its sampling stream (counter-based
software PRNG) only needs to be a valid standard normal.  Runs in interpret
mode on CPU; the same code compiles on TPU (chip cross-check in
docs/RESULTS.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu import PPOConfig, envs
from ppoc_tpu.algo import ppo
from ppoc_tpu.envs import pendulum as pend
from ppoc_tpu.models import policy as policy_mod

CFG = PPOConfig(env="pendulum", n_envs=8, rollout_len=32)
ENV = envs.make("pendulum")


def _rollout(key, env_carry=None, length=32, n_envs=8):
    return jax.jit(lambda pp, k: ppo.rollout(
        CFG, ENV, pp, k, n_envs, length, "pallas", env_carry=env_carry,
    ))(_TS.policy_params, key)


_TS = ppo.init_train_state(CFG, ENV, jax.random.PRNGKey(0))


def test_kernel_rollout_physics_match_env():
    """Stepping the generic env from the kernel's (obs, action) pairs must
    reproduce its next_obs and rewards — physics parity with
    envs/pendulum.py, hence with Gymnasium."""
    traj, _ = _rollout(jax.random.PRNGKey(1))
    T, E = 32, 8
    th = jnp.arctan2(traj.obs[..., 1], traj.obs[..., 0])
    st = pend.PendulumState(th.reshape(-1), traj.obs[..., 2].reshape(-1),
                            jnp.zeros(T * E, jnp.int32))
    _, obs2, rew, _, _ = jax.vmap(ENV.step)(
        st, traj.action.reshape(-1, 1), jax.random.split(jax.random.PRNGKey(2), T * E))
    np.testing.assert_allclose(np.asarray(obs2.reshape(T, E, 3)),
                               np.asarray(traj.next_obs), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rew.reshape(T, E)),
                               np.asarray(traj.reward), rtol=1e-4, atol=1e-5)


def test_kernel_rollout_logprob_consistency():
    traj, _ = _rollout(jax.random.PRNGKey(3))
    lp = policy_mod.log_prob(_TS.policy_params, traj.obs, traj.action,
                             "relu", "jnp", False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(traj.log_prob),
                               rtol=1e-4, atol=1e-5)


def test_kernel_rollout_truncation_and_carry():
    """Window end force-truncated; carry continues episode step counters and
    the next rollout's first obs equals the carried obs."""
    traj, carry = _rollout(jax.random.PRNGKey(4))
    assert bool(jnp.all(traj.truncated[-1] | traj.terminated[-1]))
    state, obs_after = carry
    assert np.asarray(state.t).tolist() == [32] * 8  # horizon 200 > 32
    traj2, carry2 = _rollout(jax.random.PRNGKey(5), env_carry=carry)
    np.testing.assert_allclose(np.asarray(traj2.obs[0]), np.asarray(obs_after),
                               rtol=1e-6)
    assert np.asarray(carry2[0].t).tolist() == [64] * 8


def test_kernel_rollout_autoreset_at_horizon():
    """Rolling past the 200-step horizon must truncate and reset counters."""
    traj, carry = _rollout(jax.random.PRNGKey(6), length=210, n_envs=4)
    tr = np.asarray(traj.truncated)
    assert tr[199].all()          # genuine horizon truncation
    assert not tr[:199].any()
    assert (np.asarray(carry[0].t) == 10).all()  # reset, then 10 more steps


def test_kernel_sampling_is_standard_normal():
    """eps = (a - mu)/sigma over many draws: mean ~0, std ~1, and
    deterministic per key."""
    traj, _ = _rollout(jax.random.PRNGKey(7), length=200, n_envs=64)
    mu = policy_mod.gaussian_mean(_TS.policy_params, traj.obs, "relu", "jnp")
    eps = np.asarray((traj.action - mu)
                     / jnp.exp(_TS.policy_params["log_std"])).ravel()
    assert abs(eps.mean()) < 0.02, eps.mean()
    assert abs(eps.std() - 1.0) < 0.02, eps.std()
    # lag-1 autocorrelation in time should vanish
    e2 = np.asarray(traj.action[..., 0])
    ac = np.corrcoef(e2[:-1].ravel(), e2[1:].ravel())[0, 1]
    assert abs(ac) < 0.32  # actions correlate via obs; eps itself:
    eps_t = eps.reshape(200, 64)
    ac_eps = np.corrcoef(eps_t[:-1].ravel(), eps_t[1:].ravel())[0, 1]
    assert abs(ac_eps) < 0.02, ac_eps

    traj_b, _ = _rollout(jax.random.PRNGKey(7), length=200, n_envs=64)
    np.testing.assert_array_equal(np.asarray(traj.action), np.asarray(traj_b.action))
    traj_c, _ = _rollout(jax.random.PRNGKey(8), length=200, n_envs=64)
    assert np.abs(np.asarray(traj.action) - np.asarray(traj_c.action)).max() > 0


# --------------------------------------------------------------------------
# all lane envs: physics parity via obs->state decode + generic env re-step
# --------------------------------------------------------------------------

from ppoc_tpu.envs import (  # noqa: E402
    acrobot as _ac, cartpole as _cp, mountain_car as _mc, reacher as _rc,
    simple as _sp,
)


def _decode(name, obs):
    """Reconstruct the generic env's physics state from a [N, obs] batch."""
    z = jnp.zeros((obs.shape[0],), jnp.int32)
    if name == "pendulum":
        return pend.PendulumState(
            jnp.arctan2(obs[:, 1], obs[:, 0]), obs[:, 2], z)
    if name == "simple":
        return _sp.SimpleState(obs[:, 0], z)
    if name == "cartpole":
        return _cp.CartPoleState(obs[:, 0], obs[:, 1], obs[:, 2], obs[:, 3], z)
    if name == "mountain_car":
        return _mc.MountainCarState(obs[:, 0], obs[:, 1], z)
    if name == "mountain_car_norm":
        mid = (_mc.MAX_POSITION + _mc.MIN_POSITION) / 2
        half = (_mc.MAX_POSITION - _mc.MIN_POSITION) / 2
        return _mc.MountainCarState(obs[:, 0] * half + mid,
                                    obs[:, 1] * _mc.MAX_SPEED, z)
    if name == "acrobot":
        s = jnp.stack([jnp.arctan2(obs[:, 1], obs[:, 0]),
                       jnp.arctan2(obs[:, 3], obs[:, 2]),
                       obs[:, 4], obs[:, 5]], axis=1)
        return _ac.AcrobotState(s, z)
    if name == "reacher":
        q = jnp.stack([jnp.arctan2(obs[:, 2], obs[:, 0]),
                       jnp.arctan2(obs[:, 3], obs[:, 1])], axis=1)
        qd = obs[:, 4:6] * _rc.MAX_SPEED
        return _rc.ReacherState(q, qd, obs[:, 6:8], z)
    raise KeyError(name)


@pytest.mark.parametrize("name", ["pendulum", "simple", "cartpole",
                                  "mountain_car", "mountain_car_norm",
                                  "acrobot", "reacher"])
def test_lane_env_physics_parity(name):
    """For every registered lane env: re-stepping the GENERIC env from the
    kernel's (obs, action) pairs reproduces next_obs/reward/terminated —
    i.e. the in-kernel physics and observation encoding are exact."""
    cfg = PPOConfig(env=name, n_envs=8, rollout_len=24)
    env = envs.make(name)
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    traj, carry = jax.jit(lambda pp, k: ppo.rollout(
        cfg, env, pp, k, 8, 24, "pallas"))(ts.policy_params, jax.random.PRNGKey(1))
    T, E = 24, 8
    assert traj.obs.shape == (T, E, env.spec.obs_dim)
    st = _decode(name, traj.obs.reshape(T * E, -1))
    a = traj.action.reshape(T * E, -1)
    _, obs2, rew, te, _ = jax.vmap(env.step)(
        st, a, jax.random.split(jax.random.PRNGKey(2), T * E))
    np.testing.assert_allclose(np.asarray(obs2),
                               np.asarray(traj.next_obs.reshape(T * E, -1)),
                               rtol=2e-4, atol=2e-5,
                               err_msg=f"{name} next_obs")
    np.testing.assert_allclose(np.asarray(rew),
                               np.asarray(traj.reward.reshape(-1)),
                               rtol=1e-4, atol=1e-5, err_msg=f"{name} reward")
    np.testing.assert_array_equal(np.asarray(te),
                                  np.asarray(traj.terminated.reshape(-1)),
                                  err_msg=f"{name} terminated")
    # stored log-probs consistent with a device recomputation
    lp = policy_mod.log_prob(ts.policy_params, traj.obs, traj.action,
                             "relu", "jnp", env.spec.discrete)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(traj.log_prob),
                               rtol=1e-4, atol=1e-4)
    # carry round-trips through the generic state structure
    state, obs_after = carry
    jax.tree.map(lambda x: np.asarray(x), state)


def test_lane_discrete_sampling_matches_softmax():
    """Gumbel-max class frequencies track the softmax probabilities."""
    cfg = PPOConfig(env="cartpole", n_envs=64, rollout_len=200)
    env = envs.make("cartpole")
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    traj, _ = jax.jit(lambda pp, k: ppo.rollout(
        cfg, env, pp, k, 64, 200, "pallas"))(ts.policy_params, jax.random.PRNGKey(3))
    logits = policy_mod.mlp.apply(ts.policy_params["mlp"], traj.obs, "relu", "jnp")
    p = np.asarray(jax.nn.softmax(logits, axis=-1)).reshape(-1, 2)
    a = np.asarray(traj.action).reshape(-1)
    freq1 = (a == 1).mean()
    assert abs(freq1 - p[:, 1].mean()) < 0.02, (freq1, p[:, 1].mean())


def test_kernel_rollout_trains():
    """End-to-end: the fused-rollout pallas backend still learns Pendulum
    (short smoke — full solves run on the chip, docs/RESULTS.md)."""
    cfg = CFG.replace(n_envs=16, rollout_len=64, minibatch_size=128,
                      fits_per_epoch=2, eval_envs=16, eval_len=200,
                      kernel_backend="pallas")
    from ppoc_tpu.algo.trainer import Trainer

    tr = Trainer(cfg)
    h = tr.train(n_epochs=2, log=False)
    assert np.isfinite(h[-1]["R"])
    assert h[-1]["entropy"] < 1.45  # policy updated from init entropy 1.419


def test_vmem_gate_falls_back_for_huge_shapes(monkeypatch):
    """Shapes whose output planes exceed the per-cell VMEM budget must be
    env-chunked over a grid; only un-chunkable shapes take the XLA scan
    (reacher at 4096x150 OOMed the 16 MB scoped limit single-shot on
    hardware — it now runs as 4 cells of ~13.5 MB)."""
    from ppoc_tpu.ops import pallas_rollout as pr

    assert pr.chunk_plan("pendulum", 200, 64) == 1
    assert pr.chunk_plan("pendulum", 200, 1024) == 1   # tpu preset
    # MCC solve config: 18.4 MB single-shot, hardware-verified to compile
    assert pr.chunk_plan("mountain_car_norm", 999, 512) == 1
    # reacher 4096x150 OOMed single-shot on hardware; 8 double-buffered
    # cells of 6.8 MB fit the 16 MB scoped limit (hardware-verified)
    assert pr.chunk_plan("reacher", 150, 4096) == 8
    assert pr.fits_vmem("reacher", 150, 4096)
    # tiny env counts cannot make 128-aligned chunks -> scan fallback
    assert pr.chunk_plan("reacher", 4000, 64) is None

    # force the budgets to zero: ppo.rollout must transparently use the scan
    # path and still produce a full trajectory under backend="pallas"
    monkeypatch.setattr(pr, "_SINGLE_VMEM_BUDGET", 0)
    monkeypatch.setattr(pr, "_CHUNK_VMEM_BUDGET", 0)
    assert not pr.fits_vmem("pendulum", 32, 8)
    traj, carry = _rollout(jax.random.PRNGKey(42))
    assert traj.obs.shape == (32, 8, 3)
    assert bool(jnp.all(traj.truncated[-1] | traj.terminated[-1]))
    # scan path draws eps from jax.random, not the kernel's counter PRNG —
    # a different stream for the same key proves the fallback really ran
    monkeypatch.undo()
    traj_k, _ = _rollout(jax.random.PRNGKey(42))
    assert np.abs(np.asarray(traj.action) - np.asarray(traj_k.action)).max() > 0


@pytest.mark.parametrize("name", ["pendulum", "cartpole"])
def test_chunked_rollout_bit_identical(name):
    """Env-chunking is an execution detail: C grid cells with globalized RNG
    lane counters must produce BIT-identical trajectories, carry, and eval
    metrics to the single-shot kernel."""
    from ppoc_tpu.ops import pallas_rollout as pr

    cfg = PPOConfig(env=name, n_envs=256, rollout_len=16)
    env = envs.make(name)
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(21)

    def run(C):
        return jax.jit(lambda pp, k: pr.rollout_fused(
            name, pp, k, 256, 16, "relu", None, gamma=env.spec.gamma,
            return_metrics=True, n_chunks=C))(ts.policy_params, key)

    t1, c1, m1 = run(1)
    t2, c2, m2 = run(2)
    for a, b in zip(jax.tree.leaves((t1, c1, m1)),
                    jax.tree.leaves((t2, c2, m2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # second window from the chunked carry continues identically too
    t1b, _, _ = jax.jit(lambda pp, k, c: pr.rollout_fused(
        name, pp, k, 256, 16, "relu", c, gamma=env.spec.gamma,
        return_metrics=True, n_chunks=1))(ts.policy_params, key, c1)
    t2b, _, _ = jax.jit(lambda pp, k, c: pr.rollout_fused(
        name, pp, k, 256, 16, "relu", c, gamma=env.spec.gamma,
        return_metrics=True, n_chunks=2))(ts.policy_params, key, c2)
    for a, b in zip(jax.tree.leaves(t1b), jax.tree.leaves(t2b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name,L", [("pendulum", 200), ("cartpole", 300),
                                    ("simple", 40)])
def test_in_kernel_eval_metrics_match_scan(name, L):
    """The rollout kernel's in-lane episode accumulators must reproduce
    eval_metrics_from_traj on the SAME trajectory exactly (completed
    episodes only, discounted-from-episode-start J)."""
    from ppoc_tpu.ops import pallas_rollout as pr

    cfg = PPOConfig(env=name, n_envs=8, rollout_len=L)
    env = envs.make(name)
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    traj, _, (sr, sj, ne) = jax.jit(lambda pp, k: pr.rollout_fused(
        name, pp, k, 8, L, "relu", None, gamma=env.spec.gamma,
        return_metrics=True))(ts.policy_params, jax.random.PRNGKey(3))
    m = ppo.eval_metrics_from_traj(traj, env.spec.gamma)
    assert float(ne) == float(m.episodes)
    if float(ne) > 0:
        assert float(sr) / float(ne) == pytest.approx(float(m.R), rel=1e-5)
        assert float(sj) / float(ne) == pytest.approx(float(m.J), rel=1e-4)


def test_evaluate_fast_path_matches_scan_estimator():
    """ppo.evaluate with the pallas backend (in-kernel metrics) must agree
    with the same rollout's scan-based estimator."""
    cfg = PPOConfig(env="pendulum", eval_envs=16, eval_len=200)
    ts = ppo.init_train_state(cfg, ENV, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(9)
    m_fast = jax.jit(lambda pp, k: ppo.evaluate(
        cfg, ENV, pp, k, backend="pallas"))(ts.policy_params, key)
    # reference computation: same kernel rollout, scan estimator
    from ppoc_tpu.ops import pallas_rollout as pr
    traj, _ = jax.jit(lambda pp, k: pr.rollout_fused(
        "pendulum", pp, jax.random.fold_in(k, 0) if False else k, 16, 200,
        "relu", None, gamma=0.99))(ts.policy_params, key)
    m_ref = ppo.eval_metrics_from_traj(traj, 0.99)
    assert float(m_fast.episodes) == float(m_ref.episodes)
    assert float(m_fast.R) == pytest.approx(float(m_ref.R), rel=1e-5)
    assert float(m_fast.J) == pytest.approx(float(m_ref.J), rel=1e-4)


@pytest.mark.parametrize("name", ["pendulum", "cartpole", "reacher"])
def test_in_kernel_value_planes_match_mlp_apply(name):
    """With v_params, the rollout kernel's V(s)/V(s') planes must equal
    mlp.apply on the trajectory's obs/next_obs (same weights, f32)."""
    from ppoc_tpu.models import mlp
    from ppoc_tpu.ops import pallas_rollout as pr

    cfg = PPOConfig(env=name, n_envs=8, rollout_len=32)
    env = envs.make(name)
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    traj, _, (v, nv) = jax.jit(lambda pp, vp, k: pr.rollout_fused(
        name, pp, k, 8, 32, "relu", None, gamma=env.spec.gamma,
        v_params=vp))(ts.policy_params, ts.v_params, jax.random.PRNGKey(7))
    v_ref = mlp.apply(ts.v_params, traj.obs, "relu", "jnp")[..., 0]
    nv_ref = mlp.apply(ts.v_params, traj.next_obs, "relu", "jnp")[..., 0]
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(nv_ref),
                               rtol=1e-4, atol=1e-5)


def test_rollout_return_values_wiring():
    """ppo.rollout(return_values=True) returns the in-kernel V planes on the
    pallas backend and None on the jnp fallback; fused advantages match the
    unfused computation."""
    ts = _TS
    key = jax.random.PRNGKey(11)
    traj, _, vpair = jax.jit(lambda pp, vp, k: ppo.rollout(
        CFG, ENV, pp, k, 8, 32, "pallas", v_params=vp, return_values=True,
    ))(ts.policy_params, ts.v_params, key)
    assert vpair is not None
    adv_fused, tgt_fused = ppo.compute_advantages(
        CFG, ENV, ts.v_params, traj, None, "pallas", values_pair=vpair)
    adv_ref, tgt_ref = ppo.compute_advantages(
        CFG, ENV, ts.v_params, traj, None, "jnp")
    np.testing.assert_allclose(np.asarray(adv_fused), np.asarray(adv_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tgt_fused), np.asarray(tgt_ref),
                               rtol=1e-4, atol=1e-4)

    _, _, vpair_jnp = jax.jit(lambda pp, vp, k: ppo.rollout(
        CFG, ENV, pp, k, 8, 32, "jnp", v_params=vp, return_values=True,
    ))(ts.policy_params, ts.v_params, key)
    assert vpair_jnp is None
