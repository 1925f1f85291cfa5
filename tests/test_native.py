"""Native C++ runtime vs the pure-JAX engine.

The C++ env engine is an independent implementation of the same physics
(the role the reference's CPU env/kernel twins play for its CUDA paths):
starting from identical physics states and identical action sequences, the
JAX and native engines must agree step-for-step on obs, reward, terminated
and truncated.  Also covers the checksummed blob I/O used by the checkpoint
fast path, including corruption detection.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ppoc_tpu import envs, native  # noqa: E402
from ppoc_tpu.envs import (  # noqa: E402
    acrobot, cartpole, mountain_car, pendulum, reacher, recall, simple,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)

N = 8
T = 50


def _jax_states(name, n, key):
    """Build matched (jax_state_pytree, native_state_matrix)."""
    rng = np.random.default_rng(0)
    zi = jnp.zeros((n,), jnp.int32)
    if name == "pendulum":
        th = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
        thd = rng.uniform(-1, 1, n).astype(np.float32)
        return pendulum.PendulumState(jnp.asarray(th), jnp.asarray(thd), zi), \
            np.stack([th, thd], 1)
    if name == "cartpole":
        v = rng.uniform(-0.05, 0.05, (n, 4)).astype(np.float32)
        return cartpole.CartPoleState(*[jnp.asarray(v[:, i]) for i in range(4)], zi), v
    if name == "mountain_car":
        p = rng.uniform(-0.6, -0.4, n).astype(np.float32)
        vel = np.zeros(n, np.float32)
        return mountain_car.MountainCarState(jnp.asarray(p), jnp.asarray(vel), zi), \
            np.stack([p, vel], 1)
    if name == "simple":
        s = np.zeros(n, np.float32)
        return simple.SimpleState(jnp.asarray(s), zi), s[:, None]
    if name == "acrobot":
        s = rng.uniform(-0.1, 0.1, (n, 4)).astype(np.float32)
        return acrobot.AcrobotState(jnp.asarray(s), zi), s
    if name.startswith("recall"):
        b = np.where(rng.uniform(size=n) < 0.5, -1.0, 1.0).astype(np.float32)
        first = np.ones(n, np.float32)
        return recall.RecallState(jnp.asarray(b), zi), np.stack([b, first], 1)
    if name == "reacher":
        q = rng.uniform(-np.pi, np.pi, (n, 2)).astype(np.float32)
        qd = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        tgt = rng.uniform(-0.8, 0.8, (n, 2)).astype(np.float32)
        return reacher.ReacherState(
            jnp.asarray(q), jnp.asarray(qd), jnp.asarray(tgt), zi
        ), np.concatenate([q, qd, tgt], 1)
    raise KeyError(name)


@pytest.mark.parametrize(
    "name", ["pendulum", "cartpole", "mountain_car", "simple", "acrobot",
             "reacher", "recall", "recall_long", "recall_xl", "recall_xxl",
             "recall_4k", "recall_8k", "recall_16k"]
)
def test_native_matches_jax_physics(name):
    env = envs.make(name)
    jstate, nstate = _jax_states(name, N, jax.random.PRNGKey(0))
    nat = native.NativeVecEnv(name, N)
    nat.reset(seed=0)
    nat.set_state(nstate)

    step = jax.jit(jax.vmap(env.step))
    rng = np.random.default_rng(1)
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    for t in range(T):
        if env.spec.discrete:
            a = rng.integers(0, env.spec.action_dim, (N, 1)).astype(np.int32)
            a_jax, a_nat = jnp.asarray(a), a.astype(np.float32)
        else:
            a = rng.uniform(-2, 2, (N, env.spec.action_dim)).astype(np.float32)
            a_jax, a_nat = jnp.asarray(a), a
        jstate, obs_j, rew_j, term_j, trunc_j = step(jstate, a_jax, keys)
        obs_n, rew_n, term_n, trunc_n = nat.step(a_nat)
        np.testing.assert_allclose(np.asarray(obs_j), obs_n, rtol=1e-5, atol=1e-5,
                                   err_msg=f"{name} obs diverged at t={t}")
        np.testing.assert_allclose(np.asarray(rew_j), rew_n, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(term_j), term_n)
        np.testing.assert_array_equal(np.asarray(trunc_j), trunc_n)
        if bool(np.any(term_n | trunc_n)):
            break  # done flags diverge the step counters; stop the lockstep walk


def test_native_horizon_truncation():
    nat = native.NativeVecEnv("simple", 1)
    nat.reset(seed=0)
    for t in range(simple.HORIZON):
        _, _, term, trunc = nat.step(np.zeros((1, 1), np.float32))
    assert not term[0] and trunc[0]


def test_blob_roundtrip(tmp_path):
    data = np.random.default_rng(0).bytes(100_000)
    p = str(tmp_path / "x.blob")
    native.write_blob(p, data)
    assert native.read_blob(p) == data


def test_blob_corruption_detected(tmp_path):
    data = b"\x01" * 4096
    p = str(tmp_path / "x.blob")
    native.write_blob(p, data)
    raw = bytearray(open(p, "rb").read())
    raw[100] ^= 0xFF  # flip a payload byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(IOError, match="CRC"):
        native.read_blob(p)


def test_crc_matches_zlib():
    import zlib
    data = np.random.default_rng(1).bytes(10_000)
    assert native.crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF)


def test_checkpoint_native_container_roundtrip(tmp_path):
    """Trainer.save writes the CRC container; load verifies + roundtrips
    exactly; corruption is detected (the reference's raw dump had no check)."""
    import jax

    from ppoc_tpu import PPOConfig, Trainer

    cfg = PPOConfig(env="simple", n_envs=8, rollout_len=15, minibatch_size=16,
                    fits_per_epoch=1, hidden=(16, 16), kernel_backend="jnp")
    tr = Trainer(cfg)
    p = str(tmp_path / "ck.bin")
    tr.save(p)
    assert open(p, "rb").read(4) != b"PPOC"  # wrapped in the blob container

    tr2 = Trainer(cfg)
    tr2.load(p)
    s0 = jax.device_get(tr.state)
    s1 = jax.device_get(tr2.state)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), s0, s1)

    raw = bytearray(open(p, "rb").read())
    raw[200] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        tr2.load(p)
