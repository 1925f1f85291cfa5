"""Config-carried observation normalization (obs_loc/obs_scale +
envs.wrappers.calibrate).

The on-device form of observation normalization: statistics measured by a
random-policy run (wrappers.calibrate) ride in the config, so the affine
map replays bit-exactly through checkpoints, sweep lanes and serving —
unlike the host bridge's running statistics, which live in sidecars.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu import PPOConfig, envs
from ppoc_tpu.algo.trainer import Trainer
from ppoc_tpu.envs import wrappers


def test_affine_obs_maps_observations():
    env = envs.make("pendulum")
    loc, scale = (1.0, -2.0, 0.5), (2.0, 4.0, 8.0)
    wrapped = wrappers.affine_obs(env, loc, scale)
    key = jax.random.PRNGKey(0)
    s0, o0 = env.reset(key)
    s1, o1 = wrapped.reset(key)
    np.testing.assert_allclose(
        np.asarray(o1), (np.asarray(o0) - np.asarray(loc)) / np.asarray(scale),
        rtol=1e-6)
    a = jnp.zeros((env.spec.action_dim,))
    _, o0s, r0, t0, _ = env.step(s0, a, key)
    _, o1s, r1, t1, _ = wrapped.step(s1, a, key)
    np.testing.assert_allclose(
        np.asarray(o1s),
        (np.asarray(o0s) - np.asarray(loc)) / np.asarray(scale), rtol=1e-6)
    assert float(r0) == float(r1) and bool(t0) == bool(t1)
    # the wrapped name must NOT collide with the whole-rollout kernel table
    assert wrapped.spec.name == "pendulum#affine"


def test_calibrate_normalizes_mountain_car():
    """mountain_car's raw position/velocity scales differ ~26x; calibration
    must bring both dimensions to O(1)."""
    cfg = wrappers.calibrate(
        PPOConfig(env="mountain_car"), n_envs=32, n_steps=64)
    assert len(cfg.obs_loc) == 2 and len(cfg.obs_scale) == 2
    env = envs.make_for(cfg)
    state, obs = envs.vector_reset(env, jax.random.PRNGKey(1), 64)
    traj = []
    key = jax.random.PRNGKey(2)
    for t in range(32):
        key, k_a, k_e = jax.random.split(key, 3)
        a = jax.random.uniform(k_a, (64, 1), jnp.float32, -1.0, 1.0)
        state, obs, *_ = envs.vector_autoreset_step(env, state, a, k_e)
        traj.append(obs)
    flat = np.asarray(jnp.stack(traj)).reshape(-1, 2)
    # normalized observations are O(1) in both dims
    assert (np.abs(flat.mean(axis=0)) < 1.5).all()
    assert (flat.std(axis=0) < 5.0).all() and (flat.std(axis=0) > 0.05).all()


def test_trainer_checkpoint_and_serving_replay_the_affine(tmp_path):
    cfg = wrappers.calibrate(
        PPOConfig(env="pendulum", n_envs=8, rollout_len=16,
                  minibatch_size=32, fits_per_epoch=1, eval_envs=8,
                  eval_len=16, hidden=(16,), kernel_backend="jnp"),
        n_envs=8, n_steps=32)
    tr = Trainer(cfg)
    assert tr.env.spec.name.endswith("#affine")
    tr.train(n_epochs=1, log=False, initial_eval=False)
    path = str(tmp_path / "norm.bin")
    tr.save(path)

    tr2 = Trainer.from_checkpoint(path)
    assert tr2.cfg.obs_loc == cfg.obs_loc
    assert tr2.env.spec.name.endswith("#affine")

    from ppoc_tpu import serve
    act = serve.load_policy(path)
    raw = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (4, 3)), np.float32)
    got = np.asarray(act(raw))
    # the served policy must normalize internally: acting on raw obs equals
    # the trainer's policy applied to normalized obs
    from ppoc_tpu.models import policy as policy_mod
    normed = (raw - np.asarray(cfg.obs_loc, np.float32)) \
        / np.asarray(cfg.obs_scale, np.float32)
    want = np.asarray(policy_mod.gaussian_mean(
        jax.device_get(tr.state.policy_params), jnp.asarray(normed),
        cfg.activation, "jnp"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sweep_respects_affine():
    """Sweep lanes build the env through envs.make_for: a one-seed sweep of
    a normalized config must reproduce Trainer's epoch-0 eval exactly."""
    from ppoc_tpu import sweep

    cfg = PPOConfig(env="simple", n_envs=8, rollout_len=15,
                    minibatch_size=32, fits_per_epoch=1, eval_envs=8,
                    eval_len=15, hidden=(16,), kernel_backend="jnp",
                    obs_loc=(2.0,), obs_scale=(3.0,))
    out = sweep.train_many(cfg, seeds=[0], n_epochs=1)
    assert np.isfinite(np.asarray(out["R"])).all()


def test_validation():
    with pytest.raises(ValueError, match="obs_dim"):
        Trainer(PPOConfig(env="pendulum", obs_loc=(0.0,), obs_scale=(1.0,)))
    from ppoc_tpu.envs.host import HostTrainer

    class _FakeVenv:
        n_envs = 4
        spec = envs.make("pendulum").spec

    with pytest.raises(ValueError, match="on-device"):
        HostTrainer(
            PPOConfig(env="pendulum", n_envs=4, eval_envs=4, rollout_len=16,
                      minibatch_size=16, obs_loc=(0.0, 0.0, 0.0),
                      obs_scale=(1.0, 1.0, 1.0)),
            _FakeVenv(), _FakeVenv())


def test_cli_parses_tuple_flags():
    from ppoc_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--obs-loc", "0.5,-1.0", "--obs-scale", "2.0,3.0",
         "--env", "mountain_car"])
    cfg = config_from_args(args)
    assert cfg.obs_loc == (0.5, -1.0) and cfg.obs_scale == (2.0, 3.0)
