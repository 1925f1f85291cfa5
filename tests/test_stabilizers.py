"""Training stabilizers beyond the reference (all default-off):
max_grad_norm, target_kl early stop, linear lr annealing.

Reference parity is preserved by construction — the knobs default to off
and the fused-kernel gates in algo/ppo.py reject them — so these tests pin
the ON behavior: clipping math, update freezing via the Adam step counter,
and the annealed-lr endpoint.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu import PPOConfig, envs
from ppoc_tpu.algo import ppo, recurrent
from ppoc_tpu.algo.trainer import Trainer
from ppoc_tpu.data import buffer
from ppoc_tpu.ops import adam


def test_clip_by_global_norm_math():
    grads = [(jnp.full((3,), 3.0), jnp.full((4,), 4.0))]
    # global norm = sqrt(9*3 + 16*4) = sqrt(91)
    norm = float(np.sqrt(91.0))
    clipped = adam.clip_by_global_norm(grads, 1.0)
    leaves = jax.tree.leaves(clipped)
    got = float(np.sqrt(sum(np.sum(np.square(g)) for g in leaves)))
    assert got == pytest.approx(1.0, rel=1e-5)
    # scale preserved per-leaf (direction unchanged)
    np.testing.assert_allclose(np.asarray(leaves[0]),
                               3.0 / norm * np.ones(3), rtol=1e-5)
    # under the threshold: untouched
    small = adam.clip_by_global_norm(grads, norm * 10)
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(small)[0]),
                                  np.asarray(jax.tree.leaves(grads)[0]))


def _tiny_fit(cfg):
    env = envs.make(cfg.env)
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    traj, _ = ppo.rollout(cfg, env, ts.policy_params, jax.random.PRNGKey(1),
                          cfg.n_envs, cfg.rollout_len, "jnp")
    ts2, metrics = ppo.update_step(cfg, env, ts, traj, jax.random.PRNGKey(2),
                                   backend="jnp")
    return ts, ts2, metrics


BASE = PPOConfig(env="pendulum", n_envs=8, rollout_len=32, minibatch_size=64,
                 hidden=(16, 16), n_epochs_value=2, n_epochs_policy=2)


def test_huge_clip_threshold_is_identity():
    _, ts_off, _ = _tiny_fit(BASE)
    _, ts_on, _ = _tiny_fit(BASE.replace(max_grad_norm=1e9))
    for a, b in zip(jax.tree.leaves(ts_off), jax.tree.leaves(ts_on)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tight_clip_changes_updates_and_stays_finite():
    _, ts_off, _ = _tiny_fit(BASE)
    _, ts_on, m = _tiny_fit(BASE.replace(max_grad_norm=1e-3))
    assert np.isfinite(float(m.value_loss))
    diff = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts_off.v_params),
                        jax.tree.leaves(ts_on.v_params)))
    assert diff, "a tight clip must change the updates"


def test_target_kl_freezes_after_first_breach():
    """With an unreachably small target, updates freeze within the first
    few minibatches (the first one measures KL = 0 against itself, the
    breaching one still applies): the Adam step counter pins the freeze."""
    _, ts_off, _ = _tiny_fit(BASE)
    n_updates = BASE.n_epochs_policy * BASE.num_minibatches
    assert int(ts_off.opt_policy.t) == n_updates
    _, ts_on, _ = _tiny_fit(BASE.replace(target_kl=1e-12))
    assert 1 <= int(ts_on.opt_policy.t) <= 3 < n_updates
    assert int(ts_on.opt_log_std.t) == int(ts_on.opt_policy.t)
    # value phase is NOT affected by the policy stop
    assert int(ts_on.opt_v.t) == BASE.n_epochs_value * BASE.num_minibatches


def test_target_kl_generous_is_identity():
    # equal to float noise: the never-true selects change XLA fusion, so
    # bit-exactness isn't guaranteed (measured diffs ~1e-9, one ulp)
    _, ts_off, _ = _tiny_fit(BASE)
    _, ts_on, _ = _tiny_fit(BASE.replace(target_kl=1e9))
    for a, b in zip(jax.tree.leaves(ts_off), jax.tree.leaves(ts_on)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-6, atol=1e-7)


def test_lr_anneal_endpoint_and_effect():
    # the schedule helper hits exactly 0 at the terminal step count
    cfg = BASE.replace(lr_anneal=True, n_epochs=1, fits_per_epoch=1)
    total = cfg.n_epochs * cfg.fits_per_epoch * cfg.n_epochs_value \
        * cfg.num_minibatches
    state_end = adam.AdamState(m=None, v=None,
                               t=jnp.asarray(total, jnp.int32))
    assert float(ppo._lr(3e-4, cfg, state_end, cfg.num_minibatches,
                         cfg.n_epochs_value)) == 0.0
    state_mid = adam.AdamState(m=None, v=None,
                               t=jnp.asarray(total // 2, jnp.int32))
    assert 0.0 < float(ppo._lr(3e-4, cfg, state_mid, cfg.num_minibatches,
                               cfg.n_epochs_value)) < 3e-4
    # and it changes training vs constant-lr
    _, ts_off, _ = _tiny_fit(BASE)
    _, ts_on, _ = _tiny_fit(cfg)
    diff = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts_off.v_params),
                        jax.tree.leaves(ts_on.v_params)))
    assert diff


def test_stabilizers_compose_and_learn():
    cfg = PPOConfig(env="simple", n_envs=32, rollout_len=15,
                    minibatch_size=64, fits_per_epoch=5, eval_envs=64,
                    eval_len=15, kernel_backend="jnp", hidden=(32, 32),
                    seed=0, max_grad_norm=0.5, target_kl=0.05,
                    lr_anneal=True, n_epochs=6)
    hist = Trainer(cfg).train(log=False)
    assert hist[-1]["R"] > 0.5


def test_recurrent_phases_honor_stabilizers():
    cfg = PPOConfig(env="recall", n_envs=16, rollout_len=6,
                    minibatch_size=24, hidden=(16,), rnn_hidden=8,
                    n_epochs_policy=2, n_epochs_value=2)
    env = envs.make(cfg.env)
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    traj, _ = recurrent.rollout_rnn(cfg, env, ts.policy_params,
                                    jax.random.PRNGKey(1), 16, 6)
    cfg_kl = cfg.replace(target_kl=1e-12, max_grad_norm=0.5)
    ts2, _ = ppo.update_step(cfg_kl, env, ts, traj, jax.random.PRNGKey(2),
                             backend="jnp")
    n_updates = cfg.n_epochs_policy * (16 // (24 // 6))  # 2 epochs x 4 mb
    assert 1 <= int(ts2.opt_policy.t) < n_updates
    assert int(ts2.opt_v.t) == cfg.n_epochs_value * 4


def test_clipped_value_loss_math():
    from ppoc_tpu.ops import losses

    v = jnp.asarray([1.0, 5.0, -2.0])
    vo = jnp.asarray([0.0, 0.0, 0.0])
    t = jnp.asarray([2.0, 2.0, 2.0])
    clip = 0.5
    v_cl = np.clip(np.asarray(v), -0.5, 0.5)  # vo = 0
    expect = np.mean(np.maximum((np.asarray(v) - 2.0) ** 2, (v_cl - 2.0) ** 2))
    got = float(losses.clipped_value_loss(v, vo, t, clip))
    assert got == pytest.approx(expect, rel=1e-6)


def test_huge_clip_value_is_identity_to_float_noise():
    _, ts_off, _ = _tiny_fit(BASE)
    _, ts_on, _ = _tiny_fit(BASE.replace(clip_value=1e9))
    for a, b in zip(jax.tree.leaves(ts_off), jax.tree.leaves(ts_on)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-5, atol=1e-6)


def test_tight_clip_value_changes_updates():
    _, ts_off, _ = _tiny_fit(BASE)
    _, ts_on, m = _tiny_fit(BASE.replace(clip_value=1e-3))
    assert np.isfinite(float(m.value_loss))
    diff = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts_off.v_params),
                        jax.tree.leaves(ts_on.v_params)))
    assert diff


def test_clip_value_recurrent():
    cfg = PPOConfig(env="recall", n_envs=16, rollout_len=6,
                    minibatch_size=24, hidden=(16,), rnn_hidden=8,
                    n_epochs_policy=1, n_epochs_value=2, clip_value=0.1)
    env = envs.make(cfg.env)
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    traj, _ = recurrent.rollout_rnn(cfg, env, ts.policy_params,
                                    jax.random.PRNGKey(1), 16, 6)
    ts2, m = ppo.update_step(cfg, env, ts, traj, jax.random.PRNGKey(2),
                             backend="jnp")
    assert np.isfinite(float(m.value_loss))
    assert int(ts2.opt_v.t) == cfg.n_epochs_value * 4


def test_ent_anneal():
    # with ent_coeff = 0 annealing is a no-op by construction; with a
    # nonzero coefficient the annealed run differs from the constant one
    cfg = BASE.replace(ent_coeff=0.01)
    _, ts_off, _ = _tiny_fit(cfg)
    _, ts_on, _ = _tiny_fit(cfg.replace(ent_anneal=True, n_epochs=1,
                                        fits_per_epoch=1))
    diff = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts_off.policy_params),
                        jax.tree.leaves(ts_on.policy_params)))
    assert diff
    # the coefficient helper hits 0 at the schedule end
    c = cfg.replace(ent_anneal=True, n_epochs=1, fits_per_epoch=1)
    total = c.n_epochs_policy * c.num_minibatches
    state_end = adam.AdamState(m=None, v=None,
                               t=jnp.asarray(total, jnp.int32))
    assert float(ppo._ent_coeff(c, state_end, c.num_minibatches)) == 0.0
