"""Seed-parallel sweeps (ppoc_tpu/sweep.py): one vmapped program, N runs.

The contract: a one-seed sweep IS Trainer.solve (identical PRNG threading,
tested bit-for-bit); multi-seed sweeps run every seed's full schedule in one
dispatch and every seed must actually learn.
"""
import jax
import numpy as np
import pytest

from ppoc_tpu import PPOConfig, sweep
from ppoc_tpu.algo.trainer import Trainer

CFG = PPOConfig(env="simple", n_envs=32, rollout_len=15, minibatch_size=64,
                fits_per_epoch=5, eval_envs=64, eval_len=15,
                kernel_backend="jnp", hidden=(32, 32))


def test_single_seed_sweep_matches_trainer_solve():
    out = sweep.solve_many(CFG, seeds=[2], target_R=0.8, max_epochs=12)
    tr = Trainer(CFG.replace(seed=2))
    s = tr.solve(target_R=0.8, max_epochs=12)
    assert out["epochs"][0] == s["epochs"]
    assert out["R"][0] == pytest.approx(s["R"], rel=1e-3)
    # final states agree to float noise (the leading batch dim changes XLA
    # fusion, so bit-exactness holds for the integer/eval outputs above but
    # not every weight)
    a = jax.tree.leaves(jax.device_get(tr.state))
    b = jax.tree.leaves(jax.device_get(out["states"]))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y[0], np.float64),
                                   rtol=2e-3, atol=2e-3)


def test_solve_many_all_seeds_learn():
    out = sweep.solve_many(CFG, seeds=[0, 1, 2, 3], target_R=0.8,
                           max_epochs=15)
    assert all(r >= 0.8 for r in out["R"]), out
    assert all(1 <= e <= 15 for e in out["epochs"])
    # stacked states carry the seed axis
    leaf = jax.tree.leaves(out["states"])[0]
    assert leaf.shape[0] == 4


def test_train_many_curves():
    out = sweep.train_many(CFG, seeds=[0, 1, 2], n_epochs=4)
    assert out["R"].shape == (3, 4)
    assert out["J"].shape == (3, 4)
    # every seed reaches the goal by the end of the schedule
    assert (out["R"][:, -1] > 0.5).all(), out["R"]


def test_sweep_batches_other_model_families():
    """vmap composes with the structural trunk dispatch: MoE and GRU
    sweeps run unmodified."""
    moe = CFG.replace(n_experts=2, hidden=(16, 16))
    out = sweep.train_many(moe, seeds=[0, 1], n_epochs=2)
    assert out["R"].shape == (2, 2)
    # sparse gating must reach the sweep's backend string (a bare "jnp"
    # would silently train dense-gated MoE)
    assert sweep._backend(moe.replace(moe_topk=1)) == "moe:1"
    out = sweep.train_many(moe.replace(moe_topk=1), seeds=[0], n_epochs=1)
    assert np.isfinite(out["R"]).all()
    rnn = PPOConfig(env="recall", n_envs=64, rollout_len=6,
                    minibatch_size=96, fits_per_epoch=4, eval_envs=128,
                    eval_len=6, hidden=(16,), rnn_hidden=8,
                    lr_policy=1e-3, lr_v=1e-3)
    out = sweep.train_many(rnn, seeds=[0, 1], n_epochs=3)
    assert out["R"].shape == (2, 3)
    assert np.isfinite(out["R"]).all()


def test_grid_lanes_differentiate_on_lr():
    """Hyperparameter lanes are real: a zero-lr lane must not learn while
    the reference-lr lane in the SAME dispatch solves."""
    out = sweep.train_grid(CFG, {"lr_policy": [0.0, 3e-4]}, seeds=[0],
                           n_epochs=3)
    assert out["R"].shape == (2, 3)
    by_lr = {c["lr_policy"]: r for c, r in zip(out["combos"], out["R"])}
    assert by_lr[0.0][-1] < 0.7          # frozen policy stays near chance
    assert by_lr[3e-4][-1] > 0.9         # the real lane solves


def test_solve_grid_crosses_axes_and_seeds():
    out = sweep.solve_grid(CFG, {"clip_eps": [0.1, 0.2]}, target_R=0.8,
                           seeds=[0, 1], max_epochs=12)
    assert len(out["combos"]) == 4       # 2 clip values x 2 seeds
    assert all(r >= 0.8 for r in out["R"]), out
    assert {c["clip_eps"] for c in out["combos"]} == {0.1, 0.2}
    best = out["combos"][out["best"]]
    assert out["epochs"][out["best"]] == min(out["epochs"])
    assert best["clip_eps"] in (0.1, 0.2)


def test_grid_init_std_is_sweepable():
    """init_std shapes initialization itself — the per-lane config overlay
    must reach init_train_state (traced log_std init)."""
    out = sweep.solve_grid(CFG, {"init_std": [0.5, 1.0]}, target_R=0.8,
                           seeds=[0], max_epochs=12)
    assert all(r >= 0.8 for r in out["R"]), out
    import numpy as np
    ls = np.asarray(jax.device_get(
        out["states"].policy_params["log_std"]))
    # lanes started from different log_std; both solved regardless
    assert ls.shape[0] == 2


def test_grid_validates_axes():
    with pytest.raises(ValueError, match="not grid-sweepable"):
        sweep.train_grid(CFG, {"minibatch_size": [32, 64]}, seeds=[0],
                         n_epochs=1)
    with pytest.raises(ValueError, match="at least one hyperparameter"):
        sweep.train_grid(CFG, {}, seeds=[0], n_epochs=1)
    with pytest.raises(ValueError, match="is empty"):
        sweep.train_grid(CFG, {"lr_policy": []}, seeds=[0], n_epochs=1)
    with pytest.raises(ValueError, match="at least one seed"):
        sweep.solve_grid(CFG, {"lr_policy": [1e-4]}, target_R=0.8, seeds=[])


def test_sweep_validates_config():
    with pytest.raises(ValueError, match="at least one seed"):
        sweep.train_many(CFG, seeds=[], n_epochs=1)
    with pytest.raises(ValueError, match="zero minibatches"):
        sweep.train_many(CFG.replace(minibatch_size=10_000), seeds=[0],
                         n_epochs=1)
    with pytest.raises(ValueError, match="single-device"):
        sweep.train_many(CFG.replace(tp_size=2), seeds=[0], n_epochs=1)
    with pytest.raises(ValueError, match="reset_per_fit"):
        sweep.train_many(CFG.replace(rnn_hidden=4, reset_per_fit=False),
                         seeds=[0], n_epochs=1)


def test_cli_sweep_guards():
    from ppoc_tpu import cli

    for argv in (["--env", "simple", "--sweep", "-1"],
                 ["--env", "simple", "--sweep", "2", "--save", "/tmp/x.bin"],
                 ["--env", "simple", "--sweep", "2", "--det-eval"],
                 ["--env", "simple", "--sweep", "2", "--supervise", "2",
                  "--save", "/tmp/x.bin", "--checkpoint-every", "1"],
                 # --grid: malformed axis, unknown name, non-numeric values,
                 # and the shared single-device/no-checkpoint guards
                 ["--env", "simple", "--grid", "lr-policy"],
                 ["--env", "simple", "--grid", "minibatch_size=32,64"],
                 ["--env", "simple", "--grid", "lr-policy=a,b"],
                 ["--env", "simple", "--grid", "lr-policy=1e-4", "--mesh", "2"],
                 ["--env", "simple", "--grid", "lr-policy=1e-4",
                  "--save", "/tmp/x.bin"]):
        with pytest.raises(SystemExit):
            cli.main(argv)
