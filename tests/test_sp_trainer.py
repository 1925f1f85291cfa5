"""End-to-end sequence parallelism: PPOConfig(sp_size) on a (dp, sp) mesh.

The product surface over the proven building blocks (parallel/ring_attn.py,
parallel/sp.py): attention-trunk training with the rollout window
time-sharded (algo/seqpar.py, Trainer._init_sp).  The oracle is pure-dp
training of the SAME config: with full-batch sequence minibatches the update
is permutation-invariant and the sp rollout's PRNG folding (flat device
index) matches the dp run's (dp index) env-block for env-block, so a
(dp=2, sp=2) run must track a dp=4 run to float-reassociation noise —
the same standard test_tp.py/test_pp.py hold their modes to.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ppoc_tpu.config import PPOConfig, validate
from ppoc_tpu.algo.trainer import Trainer


def _mesh2d(dp, sp):
    return Mesh(np.asarray(jax.devices()[: dp * sp]).reshape(dp, sp),
                ("dp", "sp"))


def _cfg(**kw):
    base = dict(env="pendulum", attn_dim=8, attn_heads=2, attn_layers=1,
                attn_ff=16, hidden=(16,), n_envs=8, rollout_len=16,
                minibatch_size=128, fits_per_epoch=2, eval_envs=8,
                eval_len=16, n_epochs_value=2, n_epochs_policy=2, seed=3)
    base.update(kw)
    return PPOConfig(**base)


def _max_rel_err(a, b):
    """Per-leaf max abs error normalized by the LEAF's scale (elementwise
    relative error explodes on near-zero entries under f32 reassociation)."""
    return max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.max(np.abs(np.asarray(x) - np.asarray(y)))
                           / (np.max(np.abs(np.asarray(x))) + 1e-6)),
        a, b)))


@pytest.fixture()
def _quiet_eval():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        yield


def test_sp_tracks_dp_training(_quiet_eval):
    """(dp=2, sp=2) == dp=4 to float noise: full-batch minibatches make the
    update permutation-invariant, rollout keys fold the same flat index, so
    the whole fit — rollout, all_to_all reshard, ring-attention values,
    sp-GAE, BPTT through the ring, Adam — must reproduce the dp run."""
    tr_dp = Trainer(_cfg(), mesh=Mesh(np.asarray(jax.devices()[:4]), ("dp",)))
    tr_sp = Trainer(_cfg(sp_size=2), mesh=_mesh2d(2, 2))

    m_dp = jax.tree.map(float, jax.device_get(tr_dp.train_epoch()))
    m_sp = jax.tree.map(float, jax.device_get(tr_sp.train_epoch()))
    assert m_sp.value_loss == pytest.approx(m_dp.value_loss, rel=1e-4)
    assert m_sp.entropy == pytest.approx(m_dp.entropy, rel=1e-5)

    err = _max_rel_err(jax.device_get(tr_dp.state.policy_params),
                       jax.device_get(tr_sp.state.policy_params))
    assert err < 5e-3, f"policy params diverged: {err}"
    err_v = _max_rel_err(jax.device_get(tr_dp.state.v_params),
                         jax.device_get(tr_sp.state.v_params))
    assert err_v < 5e-3, f"value params diverged: {err_v}"


def test_sp_size_one_takes_plain_dp_path(_quiet_eval):
    """sp_size=1 is pure data parallelism: the Trainer takes the dp branch,
    which requires a 1-D mesh — a leftover 2-D (dp, sp) mesh is rejected
    loudly instead of silently training on half the devices."""
    cfg1 = _cfg(minibatch_size=64, n_envs=4)
    with pytest.raises(ValueError, match="1-D"):
        Trainer(cfg1, mesh=_mesh2d(2, 1))
    tr = Trainer(cfg1, mesh=Mesh(np.asarray(jax.devices()[:2]), ("dp",)))
    assert not hasattr(tr, "_sp_ctx")


def test_sp_eval_matches_dp(_quiet_eval):
    """Evaluation shards envs over the flat mesh with the same fold as dp."""
    cfg = _cfg(eval_len=200, eval_envs=8)
    tr_dp = Trainer(cfg, mesh=Mesh(np.asarray(jax.devices()[:4]), ("dp",)))
    tr_sp = Trainer(cfg.replace(sp_size=2), mesh=_mesh2d(2, 2))
    e_dp = tr_dp.evaluate()
    e_sp = tr_sp.evaluate()
    assert e_sp.episodes == e_dp.episodes
    assert e_sp.R == pytest.approx(e_dp.R, rel=1e-4)


def test_sp_solve_runs(_quiet_eval):
    tr = Trainer(_cfg(sp_size=2), mesh=_mesh2d(2, 2))
    out = tr.solve(target_R=-1e9, max_epochs=1)
    # this config's eval window < the horizon, so R is legitimately -inf
    # (censored eval); the check is one epoch ran and R is not NaN
    assert out["epochs"] == 1 and not np.isnan(out["R"])


def test_sp_checkpoint_interchanges_with_dp(tmp_path, _quiet_eval):
    """sp state is replicated/logical, so checkpoints round-trip into a
    plain single-device attention trainer and back."""
    tr_sp = Trainer(_cfg(sp_size=2), mesh=_mesh2d(2, 2))
    tr_sp.train_epoch()
    p = str(tmp_path / "sp.ckpt")
    tr_sp.save(p)
    # from_checkpoint rebuilds with the saved cfg (sp_size=2 needs a mesh);
    # override sp_size to load into the single-device mode instead
    tr_one = Trainer.from_checkpoint(p, sp_size=1)
    a = jax.device_get(tr_sp.state.policy_params)
    b = jax.device_get(tr_one.state.policy_params)
    assert _max_rel_err(a, b) == 0.0


def test_sp_validation():
    with pytest.raises(ValueError, match="requires attn_dim"):
        validate(PPOConfig(sp_size=2))
    with pytest.raises(ValueError, match="divisible by"):
        validate(PPOConfig(attn_dim=8, rollout_len=15, sp_size=2,
                           n_envs=8, minibatch_size=64))
    with pytest.raises(ValueError, match="zero1"):
        validate(PPOConfig(attn_dim=8, rollout_len=16, sp_size=2,
                           zero1=True, n_envs=8, minibatch_size=64))
    # mesh-dependent: envs must divide the WHOLE mesh
    with pytest.raises(ValueError, match="WHOLE mesh"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            Trainer(_cfg(sp_size=2, n_envs=6, minibatch_size=32),
                    mesh=_mesh2d(2, 2))


def test_sweep_rejects_sp():
    from ppoc_tpu import sweep

    with pytest.raises(ValueError, match="sp_size"):
        sweep.train_many(_cfg(sp_size=2), [0, 1], n_epochs=1)


def test_sp_trainer_flash_ring(monkeypatch, _quiet_eval):
    """kernel_backend='pallas' with a local time shard in the flash regime
    trains through the flash-block ring end-to-end (check_vma dropped,
    models/attn._ring_core) and matches the jnp-ring trainer to float
    noise on the same config."""
    from ppoc_tpu.models import attn as attn_mod

    monkeypatch.setattr(attn_mod, "FLASH_MIN_T", 8)
    cfg = _cfg(sp_size=2, kernel_backend="pallas")
    tr_flash = Trainer(cfg, mesh=_mesh2d(2, 2))
    assert tr_flash.backend == "pallas" and not tr_flash._sp_check_vma
    m_flash = jax.tree.map(float, jax.device_get(tr_flash.train_epoch()))

    monkeypatch.setattr(attn_mod, "FLASH_MIN_T", 10_000)
    tr_jnp = Trainer(_cfg(sp_size=2), mesh=_mesh2d(2, 2))
    m_jnp = jax.tree.map(float, jax.device_get(tr_jnp.train_epoch()))
    assert m_flash.value_loss == pytest.approx(m_jnp.value_loss, rel=1e-3)
    err = _max_rel_err(jax.device_get(tr_jnp.state.policy_params),
                       jax.device_get(tr_flash.state.policy_params))
    assert err < 5e-3, f"flash-ring trainer diverged from jnp ring: {err}"


def test_sp_with_stabilizers(_quiet_eval):
    """max_grad_norm + clip_value + target_kl under (dp, sp): the gradient
    clip, the PPO2 value clip's rollout-time V(s) plane (compute_values_sp)
    and the KL early-stop's pmean all reduce over the AXIS TUPLE."""
    cfg = _cfg(sp_size=2, max_grad_norm=0.5, clip_value=0.2, target_kl=0.05)
    tr = Trainer(cfg, mesh=_mesh2d(2, 2))
    m = jax.tree.map(float, jax.device_get(tr.train_epoch()))
    assert np.isfinite(m.value_loss) and np.isfinite(m.policy_loss)


def test_sp_discrete_policy(_quiet_eval):
    """Categorical policies under (dp, sp): the take_along_axis log-prob
    and softmax entropy compute on time shards and reduce over the tuple."""
    cfg = _cfg(env="cartpole", sp_size=2)
    tr = Trainer(cfg, mesh=_mesh2d(2, 2))
    m = jax.tree.map(float, jax.device_get(tr.train_epoch()))
    assert np.isfinite(m.value_loss) and np.isfinite(m.policy_loss)
    assert m.entropy > 0.0  # categorical entropy of a 2-class policy
