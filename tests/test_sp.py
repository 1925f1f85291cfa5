"""Sequence-parallel GAE (parallel/sp.py): time-sharded scan across devices.

The cross-device analogue of the reference's cross-block merge
(gae_merge_kernel, src/ppo.cu:215-251).  Checks: the sp-sharded scan matches
the single-device associative scan AND the sequential O(T) reference on
random masked trajectories, for several shard counts, including carries that
cross shard boundaries mid-episode; comm payload stays T-independent.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ppoc_tpu.ops import gae as gae_ops
from ppoc_tpu.parallel import sp


def _random_traj(key, T, E, p_done=0.08):
    ks = jax.random.split(key, 5)
    rewards = jax.random.normal(ks[0], (T, E))
    values = jax.random.normal(ks[1], (T, E))
    next_values = jax.random.normal(ks[2], (T, E))
    terminated = jax.random.bernoulli(ks[3], p_done, (T, E))
    truncated = jnp.logical_and(
        jax.random.bernoulli(ks[4], p_done, (T, E)), ~terminated
    )
    return rewards, values, next_values, terminated, truncated


def _sharded_gae(traj, n_sp, gamma=0.99, lam=0.95):
    mesh = Mesh(np.asarray(jax.devices()[:n_sp]), ("sp",))
    fn = jax.jit(
        jax.shard_map(
            functools.partial(sp.gae_sp, gamma=gamma, lam=lam, axis_name="sp"),
            mesh=mesh,
            in_specs=(P("sp"),) * 5,
            out_specs=(P("sp"), P("sp")),
        )
    )
    return fn(*traj)


@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_sp_gae_matches_single_device(n_sp):
    T, E = 64, 16  # T % n_sp == 0 for all cases
    traj = _random_traj(jax.random.PRNGKey(n_sp), T, E)
    adv_ref, tgt_ref = gae_ops.gae(*traj, gamma=0.99, lam=0.95)
    adv_seq, tgt_seq = gae_ops.gae_reference(*traj, gamma=0.99, lam=0.95)
    adv_sp, tgt_sp = _sharded_gae(traj, n_sp)
    np.testing.assert_allclose(adv_sp, adv_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(tgt_sp, tgt_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(adv_sp, adv_seq, rtol=1e-5, atol=1e-5)


def test_sp_gae_carry_crosses_shard_boundary():
    """An episode spanning a shard boundary must carry its advantage across
    devices — an all-zero done mask makes EVERY position depend on every
    later shard."""
    T, E = 32, 4
    key = jax.random.PRNGKey(0)
    rewards = jax.random.normal(key, (T, E))
    values = jnp.zeros((T, E))
    next_values = jnp.zeros((T, E))
    term = jnp.zeros((T, E), bool)
    trunc = jnp.zeros((T, E), bool)
    traj = (rewards, values, next_values, term, trunc)
    adv_ref, _ = gae_ops.gae_reference(*traj, gamma=0.99, lam=0.95)
    adv_sp, _ = _sharded_gae(traj, 8)
    np.testing.assert_allclose(adv_sp, adv_ref, rtol=1e-5, atol=1e-5)
    # Sanity that the test bites: zeroing the carry (done at every shard
    # edge) would give a different answer at early positions.
    chunk = T // 8
    local_only = jnp.concatenate(
        [
            gae_ops.gae_reference(
                *(a[i * chunk:(i + 1) * chunk] for a in traj), 0.99, 0.95
            )[0]
            for i in range(8)
        ],
        axis=0,
    )
    assert not np.allclose(local_only, adv_ref, atol=1e-3)


def test_sp_gae_terminal_masks_block_carry():
    """A terminated step at a shard's last row must STOP the incoming carry
    exactly as the single-device scan does."""
    T, E = 16, 2
    traj = list(_random_traj(jax.random.PRNGKey(7), T, E, p_done=0.0))
    term = np.zeros((T, E), bool)
    term[7, :] = True  # last row of shard 3 when n_sp=8 (chunk=2)
    traj[3] = jnp.asarray(term)
    traj = tuple(traj)
    adv_ref, tgt_ref = gae_ops.gae_reference(*traj, gamma=0.99, lam=0.95)
    adv_sp, tgt_sp = _sharded_gae(traj, 8)
    np.testing.assert_allclose(adv_sp, adv_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(tgt_sp, tgt_ref, rtol=1e-5, atol=1e-5)


def test_sp_comm_payload_is_horizon_independent():
    """The only collective is the all_gather of the per-shard (C, D) pair:
    2 * n_sp * E floats regardless of T."""
    E, n_sp = 8, 4
    texts = []
    for T in (16, 256):
        traj = _random_traj(jax.random.PRNGKey(1), T, E)
        mesh = Mesh(np.asarray(jax.devices()[:n_sp]), ("sp",))
        fn = jax.jit(
            jax.shard_map(
                functools.partial(sp.gae_sp, gamma=0.99, lam=0.95),
                mesh=mesh,
                in_specs=(P("sp"),) * 5,
                out_specs=(P("sp"), P("sp")),
            )
        )
        texts.append(fn.lower(*traj).compile().as_text())
    import re

    def gather_shapes(txt):
        return sorted(
            set(re.findall(r"f32\[[\dx,]*\][^\n]*all-gather", txt))
        )

    assert gather_shapes(texts[0]), "expected an all-gather in the HLO"
    assert gather_shapes(texts[0]) == gather_shapes(texts[1]), (
        gather_shapes(texts[0]),
        gather_shapes(texts[1]),
    )
