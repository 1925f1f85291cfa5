"""Recurrent (GRU) model family: cell math, masking, PPO integration.

The reference has no recurrence (its nets are stateless MLPs,
src/neural_network.cu); models/gru.py + algo/recurrent.py extend the trunk
slot with memory for partially-observable envs.  Tests cover:

  * GRU cell math vs a literal numpy transcription;
  * episode-boundary masking (a lane's memory must not leak past a done);
  * rollout/update consistency: log-probs replayed by the update scan match
    the stored rollout log-probs exactly, so first-epoch PPO ratios are 1;
  * the capability differentiator on the `recall` memory env (envs/recall.py):
    a memoryless MLP cannot beat ~0.5 while the GRU solves to ~1.0;
  * dp-mesh training, checkpoint round-trip (v4 kind-2 trunks),
    from_checkpoint, recurrent serving, and config validation.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu import PPOConfig, envs
from ppoc_tpu.algo import ppo, recurrent
from ppoc_tpu.algo.trainer import Trainer
from ppoc_tpu.models import gru


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_cell_matches_numpy_transcription():
    key = jax.random.PRNGKey(0)
    params = gru.init(key, 3, 5, (5, 4, 2))
    h = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (7, 5)))
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (7, 3)))
    c = jax.device_get(params["cell"])
    gx = x @ c["wx"] + c["b"]
    gh = h @ c["wh"]
    H = 5
    r = _sigmoid(gx[:, :H] + gh[:, :H])
    z = _sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
    n = np.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
    expect = (1.0 - z) * n + z * h
    got = np.asarray(gru.cell_step(params, jnp.asarray(h), jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_apply_seq_masks_episode_boundaries():
    """Outputs after a done flag must equal a fresh-start replay: no memory
    may leak across the boundary."""
    key = jax.random.PRNGKey(3)
    params = gru.init(key, 2, 4, (4, 3))
    T, B = 6, 5
    xs = jax.random.normal(jax.random.PRNGKey(4), (T, B, 2))
    done = jnp.zeros((T, B), bool).at[2].set(True)  # every lane ends at t=2
    ys = gru.apply_seq(params, xs, done, "relu")
    ys_fresh = gru.apply_seq(
        params, xs[3:], jnp.zeros((T - 3, B), bool), "relu")
    np.testing.assert_allclose(
        np.asarray(ys[3:]), np.asarray(ys_fresh), rtol=1e-6)
    # and WITHOUT the done flag the tails differ (memory does flow)
    ys_nomask = gru.apply_seq(params, xs, jnp.zeros((T, B), bool), "relu")
    assert not np.allclose(np.asarray(ys_nomask[3:]), np.asarray(ys_fresh))


@pytest.mark.parametrize("env_name,discrete", [("recall", False),
                                               ("cartpole", True)])
def test_replayed_log_probs_match_rollout(env_name, discrete):
    """The update scan's recurrence is identical to the rollout's: replayed
    log-probs equal the stored ones, so epoch-0 PPO ratios are exactly 1."""
    env = envs.make(env_name)
    cfg = PPOConfig(env=env_name, n_envs=16, rollout_len=12,
                    minibatch_size=48, hidden=(16,), rnn_hidden=8)
    assert env.spec.discrete == discrete
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    traj, _ = recurrent.rollout_rnn(
        cfg, env, ts.policy_params, jax.random.PRNGKey(1), 16, 12)
    done = jnp.logical_or(traj.terminated, traj.truncated)
    logp, _ = recurrent.policy_log_probs_rnn(
        cfg, ts.policy_params, traj.obs, traj.action, done, discrete)
    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(traj.log_prob), rtol=1e-5, atol=1e-6)


def test_recall_differentiator():
    """The capability the family exists for: on the recall memory task the
    GRU solves (~1.0) where the best memoryless policy is a coin flip."""
    base = PPOConfig(env="recall", n_envs=128, rollout_len=6,
                     minibatch_size=192, fits_per_epoch=8, eval_envs=256,
                     eval_len=6, kernel_backend="jnp", hidden=(32,),
                     seed=0, lr_policy=1e-3, lr_v=1e-3)
    mlp_hist = Trainer(base).train(n_epochs=4, log=False)
    best_mlp = max(h["R"] for h in mlp_hist)
    rnn_hist = Trainer(base.replace(rnn_hidden=16)).train(
        n_epochs=6, log=False)
    assert best_mlp < 0.75, f"memoryless policy should stay ~0.5, got {best_mlp}"
    assert rnn_hist[-1]["R"] > 0.9, f"GRU should solve recall, got {rnn_hist[-1]['R']}"


def test_rnn_trains_on_dp_mesh():
    from ppoc_tpu.parallel import make_mesh

    cfg = PPOConfig(env="recall", n_envs=128, rollout_len=6,
                    minibatch_size=192, fits_per_epoch=8, eval_envs=256,
                    eval_len=6, kernel_backend="jnp", hidden=(32,),
                    seed=0, lr_policy=1e-3, lr_v=1e-3, rnn_hidden=16)
    hist = Trainer(cfg, mesh=make_mesh()).train(n_epochs=5, log=False)
    assert hist[-1]["R"] > 0.9


def test_checkpoint_roundtrip_and_from_checkpoint(tmp_path):
    cfg = PPOConfig(env="recall", n_envs=32, rollout_len=6,
                    minibatch_size=96, fits_per_epoch=2, eval_envs=64,
                    eval_len=6, hidden=(16,), rnn_hidden=8, seed=1)
    tr = Trainer(cfg)
    tr.train(n_epochs=1, log=False, initial_eval=False)
    path = str(tmp_path / "rnn.bin")
    tr.save(path)
    tr2 = Trainer.from_checkpoint(path)
    assert tr2.cfg.rnn_hidden == 8
    a = jax.tree.leaves(jax.device_get(tr.state))
    b = jax.tree.leaves(jax.device_get(tr2.state))
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    # adam timestep survived
    assert int(tr2.state.opt_policy.t) == int(tr.state.opt_policy.t) > 0


def test_recurrent_serving(tmp_path):
    from ppoc_tpu import serve

    cfg = PPOConfig(env="recall", n_envs=64, rollout_len=6,
                    minibatch_size=96, fits_per_epoch=8, eval_envs=128,
                    eval_len=6, hidden=(16,), rnn_hidden=8, seed=0,
                    lr_policy=1e-3, lr_v=1e-3)
    tr = Trainer(cfg)
    tr.train(n_epochs=4, log=False)
    path = str(tmp_path / "rnn_serve.bin")
    tr.save(path)
    # load_policy must refuse with a pointer to the recurrent loader
    with pytest.raises(ValueError, match="load_recurrent_policy"):
        serve.load_policy(path)
    act = serve.load_recurrent_policy(path)
    # drive the served policy through a full recall episode: it must
    # remember the cue and answer with its sign
    env = envs.make("recall")
    correct = 0
    for seed in range(8):
        key = jax.random.PRNGKey(100 + seed)
        state, obs = env.reset(key)
        h = act.initial_state()
        cue = float(state.b)
        for t in range(6):
            a, h = act(np.asarray(obs), h)
            state, obs, reward, term, trunc = env.step(
                state, jnp.asarray(a), key)
        correct += int(float(reward) > 0.5)
        assert cue * float(a[0]) > 0 or float(reward) == 0.0
    assert correct >= 7


def test_config_validation():
    with pytest.raises(ValueError, match="reset_per_fit"):
        Trainer(PPOConfig(env="recall", rnn_hidden=8, reset_per_fit=False))
    with pytest.raises(ValueError, match="cannot combine"):
        Trainer(PPOConfig(env="recall", rnn_hidden=8, n_experts=4))
    with pytest.raises(ValueError, match="cannot combine"):
        Trainer(PPOConfig(env="recall", rnn_hidden=8, tp_size=2))


def test_host_bridge_rejects_recurrent():
    """The numpy host actor and row-minibatch learner are stateless; the
    bridge must refuse recurrent configs loudly instead of miscomputing."""
    from ppoc_tpu.envs.host import HostTrainer

    class _FakeVenv:
        n_envs = 4
        spec = envs.make("recall").spec

    cfg = PPOConfig(env="recall", n_envs=4, eval_envs=4, rollout_len=6,
                    minibatch_size=8, rnn_hidden=8)
    with pytest.raises(ValueError, match="host bridge"):
        HostTrainer(cfg, _FakeVenv(), _FakeVenv())


def test_pendulum_po_spec():
    env = envs.make("pendulum_po")
    assert env.spec.obs_dim == 2
    _, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2,)
    # cos^2 + sin^2 = 1: the kept dims really are the angle features
    assert abs(float(obs[0]) ** 2 + float(obs[1]) ** 2 - 1.0) < 1e-5


def test_cartpole_po_spec():
    env = envs.make("cartpole_po")
    assert env.spec.obs_dim == 2 and env.spec.discrete
    _, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2,)
