"""Welford streaming mean/variance vs numpy, incl. the sharded merge path.

Mirrors the reference's numerically-stable parallel variance
(include/welford_var.h) test role: the pairwise tree must agree with numpy's
two-pass population statistics on benign and ill-conditioned data, and the
cross-device (n, mean, M2) merge must be exact for equal and unequal shards.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu.ops import welford


@pytest.mark.parametrize("n", [1, 2, 7, 64, 1000, 4097])
def test_matches_numpy(n):
    x = np.random.default_rng(n).normal(3.0, 2.5, n).astype(np.float32)
    mean, var = welford.mean_var(jnp.asarray(x))
    np.testing.assert_allclose(float(mean), x.mean(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(var), x.var(), rtol=1e-4, atol=1e-5)


def test_ill_conditioned():
    """Large offset + small variance — the case naive sum-of-squares loses."""
    rng = np.random.default_rng(0)
    x = (1e4 + rng.normal(0, 1e-2, 10000)).astype(np.float32)
    _, var = welford.mean_var(jnp.asarray(x))
    ref = np.var(x.astype(np.float64))
    np.testing.assert_allclose(float(var), ref, rtol=0.05)


def test_combine_associative():
    rng = np.random.default_rng(1)
    xs = [rng.normal(size=k).astype(np.float32) for k in (3, 17, 40)]
    sts = [welford.from_array(jnp.asarray(x)) for x in xs]
    left = welford.combine(welford.combine(sts[0], sts[1]), sts[2])
    right = welford.combine(sts[0], welford.combine(sts[1], sts[2]))
    full = np.concatenate(xs)
    for st in (left, right):
        np.testing.assert_allclose(float(st.mean), full.mean(), rtol=1e-5)
        np.testing.assert_allclose(float(st.m2) / float(st.n), full.var(), rtol=1e-4)


def test_sharded_merge_matches_global():
    """mean_var under shard_map == global stats of the concatenated data."""
    from jax.sharding import Mesh, PartitionSpec as P

    n_dev = len(jax.devices())
    x = np.random.default_rng(2).normal(-1.0, 4.0, (n_dev * 100,)).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))

    def local(xs):
        m, v = welford.mean_var(xs, axis_name="dp")
        return jnp.stack([m, v])

    try:
        smap = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map as smap
    f = jax.jit(smap(local, mesh=mesh, in_specs=P("dp"), out_specs=P()))
    m, v = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_allclose(m, x.mean(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v, x.var(), rtol=1e-4, atol=1e-5)
