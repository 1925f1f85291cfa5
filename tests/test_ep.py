"""Mixture-of-experts trunk + expert parallelism: exactness and training.

The MoE forward (models/moe.py) must equal the hand-computed mixture of its
expert MLPs; the ep-sharded forward (experts split over an 'ep' mesh axis,
parallel/ep.py) must reproduce the single-device MoE bit-for-bit up to f32
reduction order, INCLUDING router gradients (each rank's backward covers
only its gate slice; shard_map's pvary transpose psums them to the full
gradient).  Full EP training through the
Trainer must track single-device MoE training, and MoE checkpoints must
round-trip and interchange between single-device and EP trainers
(the version-4 kind-tagged layout, utils/checkpoint.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ppoc_tpu.models import mlp, moe
from ppoc_tpu.parallel import ep


def _smap(fn, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except AttributeError:
        from jax.experimental.shard_map import shard_map as sm
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _manual_moe(params, x, activation, topk=0):
    """Independent numpy evaluation: loop experts, softmax gate."""
    wr, br = (np.asarray(a) for a in params["router"])
    logits = np.asarray(x) @ wr + br
    z = logits - logits.max(-1, keepdims=True)
    g = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    e = g.shape[-1]
    if 0 < topk < e:
        idx = np.argsort(-g, axis=-1)[..., :topk]
        mask = np.zeros_like(g)
        np.put_along_axis(mask, idx, 1.0, axis=-1)
        g = g * mask
        g = g / g.sum(-1, keepdims=True)
    act = {"relu": lambda v: np.maximum(v, 0.0), "tanh": np.tanh}[activation]
    outs = []
    for i in range(e):
        h = np.asarray(x)
        layers = [(np.asarray(w)[i], np.asarray(b)[i])
                  for w, b in params["experts"]]
        for l, (w, b) in enumerate(layers):
            h = h @ w + b
            if l < len(layers) - 1:
                h = act(h)
        outs.append(h)
    h = np.stack(outs, axis=-2)  # [B, E, out]
    return np.einsum("be,beo->bo", g, h)


@pytest.mark.parametrize("topk", [0, 2])
@pytest.mark.parametrize("activation", ["relu", "tanh"])
def test_moe_apply_matches_manual(activation, topk):
    params = moe.init(jax.random.PRNGKey(0), (5, 16, 16, 3), n_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 5), jnp.float32)
    out = moe.apply(params, x, activation, topk=topk)
    ref = _manual_moe(params, x, activation, topk=topk)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_moe_structural_dispatch_via_mlp_apply():
    """mlp.apply routes MoE trees to moe.apply for any backend string."""
    params = moe.init(jax.random.PRNGKey(2), (4, 8, 2), n_experts=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 4), jnp.float32)
    a = mlp.apply(params, x, "relu", "jnp")
    b = moe.apply(params, x, "relu")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # encoded backend carries top-k through
    c = mlp.apply(params, x, "relu", mlp.moe_backend("jnp", topk=1))
    d = moe.apply(params, x, "relu", topk=1)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_topk_gate_zeros_and_renormalizes():
    params = moe.init(jax.random.PRNGKey(4), (3, 8, 1), n_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 3), jnp.float32)
    g = np.asarray(moe.gate_weights(params, x, topk=2))
    nonzero = (g > 0).sum(axis=-1)
    np.testing.assert_array_equal(nonzero, np.full(16, 2))
    np.testing.assert_allclose(g.sum(axis=-1), np.ones(16), rtol=1e-6)


@pytest.mark.parametrize("topk", [0, 2])
def test_ep_forward_matches_single_device(topk):
    ep_size = 4
    mesh = Mesh(np.asarray(jax.devices()[:ep_size]), ("ep",))
    params = moe.init(jax.random.PRNGKey(6), (5, 16, 16, 2), n_experts=8)
    x = jax.random.normal(jax.random.PRNGKey(7), (32, 5), jnp.float32)
    spec = ep.trunk_spec(params, "ep")

    def local(p, x):
        return moe.apply(p, x, "relu", ep_axis="ep", topk=topk)

    f = jax.jit(_smap(local, mesh, in_specs=(spec, P()), out_specs=P()))
    out = f(params, x)
    ref = moe.apply(params, x, "relu", topk=topk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ep_grads_match_single_device():
    """Expert grads (sharded) and router grads (replicated, psum'd over ep)
    must reassemble into the single-device MoE gradients."""
    ep_size = 4
    mesh = Mesh(np.asarray(jax.devices()[:ep_size]), ("ep",))
    params = moe.init(jax.random.PRNGKey(8), (5, 16, 16, 2), n_experts=8)
    x = jax.random.normal(jax.random.PRNGKey(9), (32, 5), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(10), (32, 2), jnp.float32)
    spec = ep.trunk_spec(params, "ep")

    def local_grads(p, x, y):
        def loss(q):
            out = moe.apply(q, x, "relu", ep_axis="ep", topk=0)
            return jnp.mean(jnp.square(out - y))

        return jax.grad(loss)(p)

    f = jax.jit(_smap(local_grads, mesh, in_specs=(spec, P(), P()),
                      out_specs=spec))
    g = f(params, x, y)

    def ref_loss(q):
        out = moe.apply(q, x, "relu", topk=0)
        return jnp.mean(jnp.square(out - y))

    g_ref = jax.grad(ref_loss)(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def _cfg_kw(**kw):
    base = dict(env="simple", n_envs=16, rollout_len=15, minibatch_size=32,
                fits_per_epoch=2, n_epochs=2, eval_envs=32, eval_len=15,
                kernel_backend="jnp", hidden=(16, 16), seed=3, n_experts=4)
    base.update(kw)
    return base


def test_ep_training_matches_single_device_moe():
    """Full EP training (dp=2, ep=4) must track single-device MoE training —
    same RNG streams, same algorithm, experts only sharded differently."""
    from ppoc_tpu import PPOConfig, Trainer
    from ppoc_tpu.parallel import make_mesh

    tr_ep = Trainer(PPOConfig(**_cfg_kw(ep_size=4)))
    assert dict(tr_ep.mesh.shape) == {"dp": 2, "ep": 4}
    # same dp size (2) so the per-shard RNG streams and local env counts
    # match; the only difference is whether the experts are sharded
    tr_1 = Trainer(PPOConfig(**_cfg_kw()), mesh=make_mesh(2))

    h_ep = tr_ep.train(log=False)
    h_1 = tr_1.train(log=False)
    assert abs(h_ep[-1]["R"] - h_1[-1]["R"]) < 0.15, (h_ep[-1], h_1[-1])

    w_ep = jax.device_get(tr_ep.state.v_params)
    w_1 = jax.device_get(tr_1.state.v_params)
    for a, b in zip(jax.tree.leaves(w_ep), jax.tree.leaves(w_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    # the replicated router must stay bit-identical across ep ranks: its
    # logical value equals the single-device run's to float noise
    ra = jax.device_get(tr_ep.state.policy_params["mlp"]["router"][0])
    rb = jax.device_get(tr_1.state.policy_params["mlp"]["router"][0])
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                               rtol=1e-3, atol=1e-4)


def test_load_balance_loss_values():
    """~1.0 at a near-uniform router; larger when the router collapses;
    gradients push the collapsed router toward balance."""
    params = moe.init(jax.random.PRNGKey(12), (4, 8, 1), n_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(13), (256, 4), jnp.float32)
    wr, br = params["router"]

    # an exactly-uniform router (zero logits) scores exactly E*E*(1/E^2)=1
    uniform = dict(params)
    uniform["router"] = (jnp.zeros_like(wr), jnp.zeros_like(br))
    assert float(moe.load_balance_loss(uniform, x, topk=2)) == pytest.approx(
        1.0, rel=1e-5)

    # collapse the router onto expert 0
    collapsed = dict(params)
    collapsed["router"] = (wr, br + jnp.array([10.0, 0, 0, 0]))
    worse = float(moe.load_balance_loss(collapsed, x, topk=2))
    assert worse > 1.9, worse  # ~2: f0=1/2 of top-2 slots, P0~1
    g = jax.grad(lambda p: moe.load_balance_loss(p, x, topk=2))(collapsed)
    # gradient on the dominating expert's bias is the largest positive
    # (descending it un-collapses the router)
    gb = np.asarray(g["router"][1])
    assert gb[0] == gb.max() and gb[0] > 0, gb


def test_ep_training_matches_single_device_with_aux_loss():
    """The aux loss reaches the replicated router through an invariant-only
    path under ep sharding; EP training must still track single-device MoE
    exactly (would catch a double/missing cross-rank reduction)."""
    from ppoc_tpu import PPOConfig, Trainer
    from ppoc_tpu.parallel import make_mesh

    kw = _cfg_kw(moe_topk=2, moe_aux_coeff=0.01, n_epochs=1)
    tr_ep = Trainer(PPOConfig(**kw, ep_size=4))
    tr_1 = Trainer(PPOConfig(**kw), mesh=make_mesh(2))
    h_ep = tr_ep.train(log=False)
    h_1 = tr_1.train(log=False)
    assert abs(h_ep[-1]["value_loss"] - h_1[-1]["value_loss"]) < 1e-4
    ra = jax.device_get(tr_ep.state.policy_params["mlp"]["router"][0])
    rb = jax.device_get(tr_1.state.policy_params["mlp"]["router"][0])
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                               rtol=1e-4, atol=1e-6)


def test_moe_learns_simple_env():
    """Single-device MoE policy+value trunks solve the toy integrator."""
    from ppoc_tpu import PPOConfig, Trainer

    # seed 0 inits this tiny mixture with a negative action slope and never
    # finds the sparse reward (an exploration artifact of the 15-step toy,
    # not a MoE bug); seeds 1-2 solve in 1 epoch
    cfg = PPOConfig(**_cfg_kw(fits_per_epoch=3, moe_topk=2, seed=1))
    r = Trainer(cfg).solve(target_R=0.4, max_epochs=8)
    assert r["R"] >= 0.4, r


def test_ep_solve():
    """Single-dispatch train_until works under expert parallelism too."""
    from ppoc_tpu import PPOConfig, Trainer

    cfg = PPOConfig(**_cfg_kw(fits_per_epoch=3, ep_size=2, seed=1))
    r = Trainer(cfg).solve(target_R=0.4, max_epochs=8)
    assert r["R"] >= 0.4, r


def test_moe_checkpoint_roundtrip_and_interchange(tmp_path):
    """v4 checkpoints round-trip bit-exactly and interchange between
    single-device MoE and EP trainers (the stacked layout is logical)."""
    from ppoc_tpu import PPOConfig, Trainer

    path = str(tmp_path / "moe.bin")
    tr = Trainer(PPOConfig(**_cfg_kw(moe_topk=2)))
    tr.train(n_epochs=1, log=False)
    tr.save(path)

    tr2 = Trainer.from_checkpoint(path)
    assert tr2.cfg.n_experts == 4 and tr2.cfg.moe_topk == 2
    for a, b in zip(jax.tree.leaves(jax.device_get(tr.state)),
                    jax.tree.leaves(jax.device_get(tr2.state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # load the same file into an EP trainer: specs shard it on entry
    tr_ep = Trainer.from_checkpoint(path, ep_size=2)
    m = tr_ep.evaluate()
    m1 = tr2.evaluate()
    # both trainers continue training fine
    tr_ep.train(n_epochs=1, log=False)
    tr2.train(n_epochs=1, log=False)


def test_ep_config_validation():
    from ppoc_tpu import PPOConfig, Trainer

    with pytest.raises(ValueError, match="divisible"):
        Trainer(PPOConfig(**_cfg_kw(n_experts=3, ep_size=2)))
    with pytest.raises(ValueError, match="requires n_experts"):
        Trainer(PPOConfig(**_cfg_kw(n_experts=1, ep_size=2)))
    with pytest.raises(ValueError, match="cannot combine"):
        Trainer(PPOConfig(**_cfg_kw(ep_size=2, tp_size=2)))
    with pytest.raises(ValueError, match="tp_size/pp_size"):
        Trainer(PPOConfig(**_cfg_kw(tp_size=2)))


def test_host_trainer_rewrites_moe_backend():
    """The host-bridge learner must score log-probs under the SAME gating
    the host actor samples with: HostTrainer encodes moe_topk into its
    backend string (a plain "jnp" would silently parse as dense topk=0
    gating while HostPolicy samples top-k — mismatched PPO ratios)."""
    from ppoc_tpu import native
    from ppoc_tpu.envs.host import HostPolicy, HostTrainer, NativeHostVecEnv

    if not native.available():
        pytest.skip("native library unavailable")
    from ppoc_tpu import PPOConfig

    cfg = PPOConfig(env="simple", n_envs=8, rollout_len=15, minibatch_size=32,
                    fits_per_epoch=1, eval_envs=8, eval_len=15, hidden=(8, 8),
                    kernel_backend="jnp", seed=0, n_experts=4, moe_topk=2)
    tr = HostTrainer(cfg, NativeHostVecEnv("simple", 8, seed=0),
                     NativeHostVecEnv("simple", 8, seed=9))
    assert tr.backend == "moe:2", tr.backend
    # actor and learner now agree on the policy mean
    hp = HostPolicy(tr.state.policy_params, cfg.activation, discrete=False,
                    moe_topk=cfg.moe_topk)
    obs = np.random.default_rng(1).standard_normal((16, 1)).astype(np.float32)
    mu_learner = mlp.apply(tr.state.policy_params["mlp"], jnp.asarray(obs),
                           cfg.activation, tr.backend)
    np.testing.assert_allclose(hp.forward(obs), np.asarray(mu_learner),
                               rtol=1e-5, atol=1e-6)
    # and one full fit runs through the jitted update with the moe backend
    tr.train_fit()


def test_host_policy_moe_matches_device():
    """The numpy host actor's MoE forward mirrors moe.apply."""
    from ppoc_tpu.envs.host import HostPolicy

    params = {
        "mlp": moe.init(jax.random.PRNGKey(11), (4, 16, 2), n_experts=4),
        "log_std": jnp.zeros((2,), jnp.float32),
    }
    obs = np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32)
    for topk in (0, 2):
        hp = HostPolicy(params, "relu", discrete=False, moe_topk=topk)
        out = hp.forward(obs)
        ref = moe.apply(params["mlp"], jnp.asarray(obs), "relu", topk=topk)
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-5, atol=1e-5)
