"""Pallas fused-MLP kernels vs the pure-jnp twin.

Mirrors the reference's practice of keeping naive kernels beside the cuBLAS
path as implicit cross-checks (src/mat_mul.cu:83-120): every forward value
and every gradient (dW, db, dx) must match the jnp backend, which XLA
differentiates independently.  Off-TPU the Pallas kernels run in interpret
mode, so this exercises the same kernel code that runs on the chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu.models import mlp
from ppoc_tpu.ops import pallas_mlp


def _rand_params(key, sizes):
    return mlp.init(key, sizes)


@pytest.mark.parametrize("sizes", [(3, 128, 128, 1), (3, 64, 64, 2), (17, 32, 5)])
@pytest.mark.parametrize("batch", [64, 100, 1024])
@pytest.mark.parametrize("activation", ["relu", "tanh"])
def test_forward_matches_jnp(sizes, batch, activation):
    key = jax.random.PRNGKey(0)
    params = _rand_params(key, sizes)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, sizes[0]), jnp.float32)
    out_pl = pallas_mlp.mlp_forward(params, x, activation)
    out_ref = mlp.apply(params, x, activation, "jnp")
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sizes", [(3, 128, 128, 1), (5, 32, 32, 2)])
@pytest.mark.parametrize("batch", [64, 100])
@pytest.mark.parametrize("activation", ["relu", "tanh"])
def test_grads_match_jnp(sizes, batch, activation):
    key = jax.random.PRNGKey(2)
    params = _rand_params(key, sizes)
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, sizes[0]), jnp.float32)

    def loss_pl(p, x):
        return jnp.sum(jnp.square(pallas_mlp.mlp_forward(p, x, activation)))

    def loss_ref(p, x):
        return jnp.sum(jnp.square(mlp.apply(p, x, activation, "jnp")))

    (gp_pl, gx_pl) = jax.grad(loss_pl, argnums=(0, 1))(params, x)
    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(params, x)

    for (dw_pl, db_pl), (dw_ref, db_ref) in zip(gp_pl, gp_ref):
        np.testing.assert_allclose(np.asarray(dw_pl), np.asarray(dw_ref), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(db_pl), np.asarray(db_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)


def test_leading_dims_and_jit():
    """[T, E, d] inputs flatten internally; works under jit."""
    sizes = (3, 32, 32, 1)
    params = _rand_params(jax.random.PRNGKey(4), sizes)
    x = jax.random.normal(jax.random.PRNGKey(5), (7, 13, 3), jnp.float32)
    f = jax.jit(lambda p, x: pallas_mlp.mlp_forward(p, x, "relu"))
    out = f(params, x)
    ref = mlp.apply(params, x, "relu", "jnp")
    assert out.shape == (7, 13, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_value_and_grad_through_policy_loss():
    """End-to-end: the pallas backend drives a PPO-style loss identically."""
    from ppoc_tpu.models import policy as policy_mod

    key = jax.random.PRNGKey(6)
    params = policy_mod.init(key, 3, 1, (32, 32), 1.0, False)
    obs = jax.random.normal(jax.random.PRNGKey(7), (64, 3), jnp.float32)
    act = jax.random.normal(jax.random.PRNGKey(8), (64, 1), jnp.float32)

    def loss(p, backend):
        lp = policy_mod.log_prob(p, obs, act, "relu", backend, False)
        return jnp.mean(jnp.square(lp))

    g_pl = jax.grad(lambda p: loss(p, "pallas"))(params)
    g_ref = jax.grad(lambda p: loss(p, "jnp"))(params)
    chex_ok = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        g_pl, g_ref,
    )
    del chex_ok
