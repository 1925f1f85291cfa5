"""Critic->policy encoder transplant (transplant_patience /
Trainer.transplant_value_trunk) — the measured rescue for the recall_long
seed trap (docs/RESULTS.md round 5: the critic builds the cue-retrieval
circuit supervised; a trapped policy lifts ~3 epochs after receiving it;
a fresh random encoder does NOT rescue)."""
import jax
import numpy as np
import pytest

from ppoc_tpu import PPOConfig, Trainer
from ppoc_tpu import config as config_mod
from ppoc_tpu.algo import ppo


def _cfg(**kw):
    base = dict(env="recall", n_envs=8, rollout_len=6, minibatch_size=48,
                fits_per_epoch=1, eval_envs=16, eval_len=6, hidden=(16,),
                seed=0, attn_dim=8, attn_layers=1, attn_heads=2)
    base.update(kw)
    return PPOConfig(**base)


def _eq(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_method_attention():
    tr = Trainer(_cfg())
    tr.train_epoch()
    head_before = jax.tree.map(np.asarray, tr.state.policy_params["mlp"]["head"])
    log_std_before = np.asarray(tr.state.policy_params["log_std"])
    assert not _eq(tr.state.policy_params["mlp"]["attn"],
                   tr.state.v_params["attn"])
    tr.transplant_value_trunk()
    assert _eq(tr.state.policy_params["mlp"]["attn"], tr.state.v_params["attn"])
    assert _eq(tr.state.policy_params["mlp"]["head"], head_before)
    np.testing.assert_array_equal(
        np.asarray(tr.state.policy_params["log_std"]), log_std_before)
    assert int(tr.state.opt_policy.t) == 0  # moments reset
    tr.train_epoch()  # still trains after surgery
    assert np.isfinite(tr.evaluate().R)


def test_method_gru():
    tr = Trainer(_cfg(attn_dim=0, attn_heads=2, rnn_hidden=8))
    tr.train_epoch()
    tr.transplant_value_trunk()
    assert _eq(tr.state.policy_params["mlp"]["cell"], tr.state.v_params["cell"])
    tr.train_epoch()


def test_method_dense_raises():
    tr = Trainer(PPOConfig(env="pendulum", n_envs=8, rollout_len=50,
                           minibatch_size=100, eval_envs=8, eval_len=200,
                           hidden=(16, 16)))
    with pytest.raises(ValueError, match="sequence trunk"):
        tr.transplant_value_trunk()


def test_auto_trigger_on_plateau(monkeypatch):
    """A flat eval-R stream fires the one-time transplant after exactly
    `patience` non-improving epochs and marks the history row."""
    tr = Trainer(_cfg(transplant_patience=3))
    fired = []
    orig = Trainer.transplant_value_trunk
    monkeypatch.setattr(Trainer, "transplant_value_trunk",
                        lambda self: (fired.append(True), orig(self))[1])
    monkeypatch.setattr(
        Trainer, "evaluate",
        lambda self, deterministic=False: ppo.EvalMetrics(
            J=0.1, R=0.5, episodes=16))
    hist = tr.train(n_epochs=6, log=False)
    assert len(fired) == 1  # one-time
    assert any(r.get("transplanted") for r in hist)
    # fires on the `patience`-th flat epoch (epoch index patience since the
    # first epoch sets the baseline improvement)
    assert [i for i, r in enumerate(hist) if r.get("transplanted")] == [3]


def test_validation():
    with pytest.raises(ValueError, match="sequence trunk"):
        config_mod.validate(PPOConfig(env="pendulum", transplant_patience=5))
    with pytest.raises(ValueError, match="zero1"):
        config_mod.validate(_cfg(transplant_patience=5, zero1=True))
