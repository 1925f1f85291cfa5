"""Pipeline-parallel MLP vs the plain net: values and gradients exact.

The GPipe schedule (parallel/pp.py) with zero-padded square stages must
reproduce mlp.apply exactly, and autodiff through the ppermute handoffs must
yield gradients identical to the replicated net after unsharding.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ppoc_tpu.models import mlp
from ppoc_tpu.parallel import pp


def _smap(fn, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except AttributeError:
        from jax.experimental.shard_map import shard_map as sm
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _packed(params, pp_size):
    stages = pp.shard_stage_params(params, pp_size)
    return tuple(
        jnp.stack([st[i] for st in stages]) for i in range(3)
    )  # (W [S, L/S, W, W], b [S, L/S, W], act [S, L/S])


@pytest.mark.parametrize("sizes,pp_size", [
    ((3, 64, 64, 1), 3),                       # one layer per stage
    ((5, 32, 32, 32, 2), 2),                   # two layers per stage
    ((7, 16, 16, 16, 16, 16, 16, 16, 4), 4),   # eight layers, four stages
])
@pytest.mark.parametrize("activation", ["relu", "tanh"])
def test_pp_forward_matches_plain(sizes, pp_size, activation):
    mesh = Mesh(np.asarray(jax.devices()[:pp_size]), ("pp",))
    params = mlp.init(jax.random.PRNGKey(0), sizes)
    M, mb = 4, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (M * mb, sizes[0]), jnp.float32)
    ws, bs, acts = _packed(params, pp_size)

    def local(ws, bs, acts, x):
        return pp.apply_pipeline(ws[0], bs[0], acts[0], x, sizes[-1], M,
                                 activation, "pp")

    f = jax.jit(_smap(local, mesh,
                      in_specs=(P("pp"), P("pp"), P("pp"), P()),
                      out_specs=P()))
    out = f(ws, bs, acts, x)
    ref = mlp.apply(params, x, activation, "jnp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pp_grads_match_plain():
    sizes, pp_size, activation = (3, 32, 32, 1), 3, "relu"
    mesh = Mesh(np.asarray(jax.devices()[:pp_size]), ("pp",))
    params = mlp.init(jax.random.PRNGKey(2), sizes)
    M, mb = 4, 8
    x = jax.random.normal(jax.random.PRNGKey(3), (M * mb, 3), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(4), (M * mb, 1), jnp.float32)
    ws, bs, acts = _packed(params, pp_size)

    def local(ws, bs, acts, x, y):
        def loss(w, b):
            out = pp.apply_pipeline(w, b, acts[0], x, 1, M, activation, "pp")
            return jnp.mean(jnp.square(out - y))

        gw, gb = jax.grad(loss, argnums=(0, 1))(ws[0], bs[0])
        return gw[None], gb[None]

    f = jax.jit(_smap(local, mesh,
                      in_specs=(P("pp"), P("pp"), P("pp"), P(), P()),
                      out_specs=(P("pp"), P("pp"))))
    gws, gbs = f(ws, bs, acts, x, y)
    stage_grads = [(gws[s], gbs[s], None) for s in range(pp_size)]
    g_full = pp.unshard_stage_grads(stage_grads, params, pp_size)

    def ref_loss(p):
        return jnp.mean(jnp.square(mlp.apply(p, x, activation, "jnp") - y))

    g_ref = jax.grad(ref_loss)(params)
    for (gw, gb), (rw, rb) in zip(g_full, g_ref):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-5)


def test_pp_rejects_uneven_layers():
    params = mlp.init(jax.random.PRNGKey(5), (3, 16, 16, 1))  # 3 layers
    with pytest.raises(ValueError, match="partition"):
        pp.shard_stage_params(params, 2)
