"""ZeRO-1 optimizer-state sharding (cfg.zero1, ops/adam.update_zero1).

The reference is single-GPU with one replicated Adam per net
(src/adam.cu); at data-parallel scale, replicating m/v wastes 2x parameter
memory per rank.  zero1 gives each rank a 1/N slice of the flattened
moments, updates its parameter slice and all_gathers — mathematically the
SAME optimizer, so the tests' bar is exactness against the replicated
path, not just learning.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu import PPOConfig
from ppoc_tpu.algo.trainer import Trainer
from ppoc_tpu.ops import adam
from ppoc_tpu.parallel import make_mesh


def _tree_params(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    return [
        (jax.random.normal(ks[0], (5, 7)), jax.random.normal(ks[1], (7,))),
        (jax.random.normal(ks[2], (7, 3)), jax.random.normal(ks[3], (3,))),
    ]


def test_update_zero1_matches_replicated_adam():
    """5 lockstep steps inside an 8-way shard_map equal the plain pytree
    Adam bit-for-bit (same math, different layout)."""
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = make_mesh()
    n = mesh.size
    params = _tree_params()
    grads_seq = [_tree_params(k + 10) for k in range(5)]

    ref_p, ref_opt = params, adam.init(params)
    for g in grads_seq:
        ref_p, ref_opt = adam.update(ref_p, g, ref_opt, 1e-3, 0.9, 0.999, 1e-8)

    packed = adam.pack_zero1(adam.init(params), n)
    spec = adam.AdamState(m=P("dp"), v=P("dp"), t=P())

    def run(p, opt, gs):
        for g in gs:
            p, opt = adam.update_zero1(
                p, g, opt, 1e-3, 0.9, 0.999, 1e-8, "dp")
        return p, opt

    fn = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(), spec, P()), out_specs=(P(), spec)))
    z_p, z_opt = fn(params, packed, grads_seq)

    for a, b in zip(jax.tree.leaves(ref_p), jax.tree.leaves(z_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # unpacked moments match the replicated state too
    un = adam.unpack_zero1(jax.device_get(z_opt), params)
    for a, b in zip(jax.tree.leaves(ref_opt.m), jax.tree.leaves(un.m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert int(un.t) == 5


def _cfg(**kw):
    return PPOConfig(env="pendulum", n_envs=16, rollout_len=32,
                     minibatch_size=64, fits_per_epoch=2, n_epochs_value=3,
                     n_epochs_policy=2, eval_envs=16, eval_len=32,
                     hidden=(16, 16), kernel_backend="jnp", seed=0, **kw)


def test_zero1_training_matches_dp_training():
    """A full shard_map'd train epoch under zero1 reproduces the plain-dp
    epoch: identical data path, mathematically identical optimizer."""
    tr_dp = Trainer(_cfg(), mesh=make_mesh())
    tr_z = Trainer(_cfg(zero1=True), mesh=make_mesh())
    for _ in range(2):
        tr_dp.train_epoch()
        tr_z.train_epoch()
    a = tr_dp.state
    b = tr_z._unshard_state(jax.device_get(tr_z.state))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5)


def test_zero1_moments_are_sharded():
    """The live placed state really holds flat moment vectors (1/N per
    device), not replicated trees."""
    tr = Trainer(_cfg(zero1=True), mesh=make_mesh())
    tr.train_epoch()  # places the state per the shard_map out_specs
    m = tr.state.opt_v.m
    assert m.ndim == 1  # flat packed layout
    n_params = sum(np.size(x) for x in jax.tree.leaves(tr.state.v_params))
    assert m.size >= n_params and m.size % 8 == 0
    shard_shapes = {s.data.shape for s in m.addressable_shards}
    assert shard_shapes == {(m.size // 8,)}


def test_zero1_checkpoint_interchanges_with_plain(tmp_path):
    """Checkpoints always hold the logical tree layout: a zero1 run's file
    loads in a plain trainer and vice versa."""
    mesh = make_mesh()
    tr = Trainer(_cfg(zero1=True), mesh=mesh)
    tr.train_epoch()
    path = str(tmp_path / "z1.bin")
    tr.save(path)
    # plain single-device trainer loads it (zero1 overridden off)
    tr_plain = Trainer.from_checkpoint(path, zero1=False)
    a = tr._unshard_state(jax.device_get(tr.state))
    b = jax.device_get(tr_plain.state)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    # and back into a zero1 trainer
    tr2 = Trainer.from_checkpoint(path, mesh=mesh)
    assert tr2.cfg.zero1
    c = tr2._unshard_state(jax.device_get(tr2.state))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(c)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_zero1_solve_runs():
    """train_until compiles and runs under the sharded state spec."""
    tr = Trainer(_cfg(zero1=True), mesh=make_mesh())
    res = tr.solve(target_R=1e9, max_epochs=1)  # one epoch, no early stop
    # R is -inf here (eval window < horizon censors every episode); the
    # assertion is that the sharded-state solve program compiled and ran
    assert res["epochs"] == 1
    assert np.isfinite(float(jax.device_get(tr.state.opt_v.m).sum()))


def test_zero1_validation():
    with pytest.raises(ValueError, match="multi-device mesh"):
        Trainer(_cfg(zero1=True))
    with pytest.raises(ValueError, match="cannot combine"):
        Trainer(_cfg(zero1=True, tp_size=2))
    from ppoc_tpu import sweep
    with pytest.raises(ValueError, match="single-device"):
        sweep._validate(_cfg(zero1=True), [0])


def test_zero1_with_sequence_trunk():
    """The shared Adam-step helpers route the sequence (GRU) phases through
    the sharded optimizer too."""
    cfg = PPOConfig(env="recall", n_envs=32, rollout_len=6,
                    minibatch_size=48, fits_per_epoch=1, eval_envs=32,
                    eval_len=6, hidden=(16,), rnn_hidden=8, seed=0,
                    zero1=True)
    tr = Trainer(cfg, mesh=make_mesh())
    m = tr.train_epoch()
    assert np.isfinite(float(jax.device_get(m.value_loss)))
