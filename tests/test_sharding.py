"""Data-parallel training on an emulated 8-device CPU mesh.

The reference has no distributed path (SURVEY.md §2a); this is new surface.
Checks: shard_map training runs and learns, parameters stay replicated,
global advantage normalization matches the single-device result, and the
multichip dryrun entry used by the driver executes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu import PPOConfig, envs
from ppoc_tpu.algo import ppo
from ppoc_tpu.algo.trainer import Trainer
from ppoc_tpu.parallel import make_mesh


def small_cfg(**kw):
    base = dict(
        env="simple", n_envs=32, rollout_len=15, minibatch_size=64,
        fits_per_epoch=5, n_epochs=2, eval_envs=64, eval_len=15,
        kernel_backend="jnp", hidden=(32, 32), seed=0,
    )
    base.update(kw)
    return PPOConfig(**base)


def test_mesh_has_8_devices():
    assert make_mesh().size == 8


def test_shard_map_training_learns():
    tr = Trainer(small_cfg(n_epochs=3), mesh=make_mesh())
    hist = tr.train(log=False)
    assert hist[-1]["R"] > 0.3, [h["R"] for h in hist]


def test_params_stay_replicated_across_shards():
    mesh = make_mesh()
    tr = Trainer(small_cfg(n_epochs=1), mesh=mesh)
    tr.train_epoch()
    w = tr.state.policy_params["mlp"][0][0]
    # fetch each device's copy and compare
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_indivisible_sizes_rejected():
    with pytest.raises(ValueError):
        Trainer(small_cfg(n_envs=15), mesh=make_mesh())


def test_global_adv_normalization_uses_psum():
    """Mean/std of normalized advantages must be global (whole buffer), not
    per-shard: run compute_advantages under shard_map and check the global
    moments."""
    from jax.sharding import PartitionSpec as P

    cfg = small_cfg(env="pendulum")
    env = envs.make("pendulum")
    key = jax.random.PRNGKey(0)
    ts = ppo.init_train_state(cfg, env, key)
    mesh = make_mesh()

    def local(params, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        traj, _ = ppo.rollout(cfg, env, params["pi"], key, 4, 50, "jnp", axis_name="dp")
        adv, _ = ppo.compute_advantages(cfg, env, params["v"], traj, "dp", "jnp")
        return adv

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P()), out_specs=P(None, "dp")
        )
    )
    adv = fn({"pi": ts.policy_params, "v": ts.v_params}, key)
    assert adv.shape == (50, 32)
    assert abs(float(adv.mean())) < 1e-5
    np.testing.assert_allclose(float(adv.std()), 1.0, atol=1e-3)


def test_dryrun_multichip_entry():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
