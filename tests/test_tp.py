"""Tensor-parallel MLP vs the replicated net: values and gradients exact.

The tp-local forward (column/row-parallel with psum contractions,
ppoc_tpu/parallel/tp.py) must reproduce mlp.apply bit-for-bit up to f32
reduction order, and its per-shard gradients must reassemble into the
replicated gradients — the property that lets per-device Adam slices update
with no extra collectives.

Placement convention exercised here (the production layout): column-layer
params and row-layer weights are P("tp")-stacked; row-layer biases are
replicated (P()) — they add to an already-psum'd activation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ppoc_tpu.models import mlp
from ppoc_tpu.parallel import tp


def _smap(fn, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except AttributeError:
        from jax.experimental.shard_map import shard_map as sm
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _pack(params, tp_size):
    """(stacked pytree, in_specs pytree): stack varying leaves over a leading
    tp dim; row-layer biases stay replicated."""
    shards = tp.shard_params_all(params, tp_size)
    packed, specs = [], []
    for i in range(len(params)):
        w = jnp.stack([s[i][0] for s in shards])
        if i == 0:
            b = jnp.stack([s[i][1] for s in shards])
            packed.append((w, b))
            specs.append((P("tp"), P("tp")))
        else:
            packed.append((w, shards[0][i][1]))
            specs.append((P("tp"), P()))
    return packed, specs


def _unpack_local(packed):
    return [(w[0], b[0] if i == 0 else b) for i, (w, b) in enumerate(packed)]


@pytest.mark.parametrize("sizes", [(3, 64, 64, 1), (5, 32, 32, 32, 2), (7, 16, 4)])
@pytest.mark.parametrize("activation", ["relu", "tanh"])
def test_tp_forward_matches_replicated(sizes, activation):
    tp_size = 4
    mesh = Mesh(np.asarray(jax.devices()[:tp_size]), ("tp",))
    params = mlp.init(jax.random.PRNGKey(0), sizes)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, sizes[0]), jnp.float32)
    packed, specs = _pack(params, tp_size)

    def local(packed_local, x):
        return tp.apply_tp(_unpack_local(packed_local), x, activation, "tp")

    f = jax.jit(_smap(local, mesh, in_specs=(specs, P()), out_specs=P()))
    out = f(packed, x)
    ref = mlp.apply(params, x, activation, "jnp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tp_grads_reassemble_to_replicated():
    sizes, activation, tp_size = (3, 64, 64, 1), "relu", 4
    mesh = Mesh(np.asarray(jax.devices()[:tp_size]), ("tp",))
    params = mlp.init(jax.random.PRNGKey(2), sizes)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, sizes[0]), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(4), (32, 1), jnp.float32)
    packed, specs = _pack(params, tp_size)

    def local_grads(packed_local, x, y):
        local_params = _unpack_local(packed_local)

        def loss(p):
            out = tp.apply_tp(p, x, activation, "tp")
            return jnp.mean(jnp.square(out - y))

        g = jax.grad(loss)(local_params)
        # repack: varying leaves gain the leading tp dim back
        return [(gw[None], gb[None] if i == 0 else gb)
                for i, (gw, gb) in enumerate(g)]

    f = jax.jit(_smap(local_grads, mesh, in_specs=(specs, P(), P()),
                      out_specs=specs))
    g_packed = f(packed, x, y)
    g_shards = [
        [(gw[r], gb[r] if i == 0 else gb)
         for i, (gw, gb) in enumerate(g_packed)]
        for r in range(tp_size)
    ]
    g_full = tp.unshard_params(g_shards)

    def ref_loss(p):
        out = mlp.apply(p, x, activation, "jnp")
        return jnp.mean(jnp.square(out - y))

    g_ref = jax.grad(ref_loss)(params)
    for (gw, gb), (rw, rb) in zip(g_full, g_ref):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-5)


def test_shard_roundtrip():
    params = mlp.init(jax.random.PRNGKey(5), (3, 32, 32, 2))
    back = tp.unshard_params(tp.shard_params_all(params, 4))
    for (w, b), (w2, b2) in zip(params, back):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(b2))


def test_tp1_degrades_to_plain():
    params = mlp.init(jax.random.PRNGKey(6), (3, 16, 1))
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 3), jnp.float32)
    out = tp.apply_tp(params, x, "relu", None)
    ref = mlp.apply(params, x, "relu", "jnp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_tp_training_matches_dp_training():
    """Full TP training (dp=4, tp=2) must track pure-DP training (dp=4) —
    same RNG streams, same algorithm, weights only sharded differently."""
    from ppoc_tpu import PPOConfig, Trainer
    from ppoc_tpu.parallel import make_mesh

    cfg = dict(env="simple", n_envs=16, rollout_len=15, minibatch_size=32,
               fits_per_epoch=2, n_epochs=2, eval_envs=32, eval_len=15,
               kernel_backend="jnp", hidden=(16, 16), seed=3)
    tr_tp = Trainer(PPOConfig(**cfg, tp_size=2))
    tr_dp = Trainer(PPOConfig(**cfg), mesh=make_mesh(4))

    h_tp = tr_tp.train(log=False)
    h_dp = tr_dp.train(log=False)
    # same data, same updates: eval returns agree to f32 reduction noise
    assert abs(h_tp[-1]["R"] - h_dp[-1]["R"]) < 0.15, (h_tp[-1], h_dp[-1])

    from ppoc_tpu.parallel import tp as tp_mod
    w_tp = tp_mod.unshard_packed(jax.device_get(tr_tp.state.v_params))
    w_dp = jax.device_get(tr_dp.state.v_params)
    for (a, ab), (b, bb) in zip(w_tp, w_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ab), np.asarray(bb), rtol=1e-3, atol=1e-4)


def test_tp_solve():
    """Single-dispatch train_until works under tensor parallelism too."""
    from ppoc_tpu import PPOConfig, Trainer

    cfg = PPOConfig(env="simple", n_envs=16, rollout_len=15, minibatch_size=32,
                    fits_per_epoch=3, eval_envs=32, eval_len=15,
                    kernel_backend="jnp", hidden=(16, 16), seed=0, tp_size=2)
    r = Trainer(cfg).solve(target_R=0.4, max_epochs=8)
    assert r["R"] >= 0.4, r
