"""Pure-JAX env physics cross-checked step-for-step against Gymnasium.

The reference trusts Gymnasium through its CPython bridge; our envs
re-implement the physics, so these tests are the parity proof
(SURVEY.md §7 "hard parts": physics must match or learning curves drift).
"""
import gymnasium
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu import envs


def _rollout_match(gym_name, ours, set_state, get_action, n_steps=300, atol=1e-3):
    """Drive gymnasium and our env with identical states+actions, compare.

    Our physics are f32 while Gymnasium computes in f64, so state is re-synced
    every 25 steps to keep the comparison about the equations, not about
    compounding rounding drift.
    """
    genv = gymnasium.make(gym_name).unwrapped
    genv.reset(seed=0)
    key = jax.random.PRNGKey(0)
    # start both from the same internal state
    state, _ = ours.reset(key)
    state = set_state(genv, state)
    step = jax.jit(ours.step)
    for i in range(n_steps):
        a = get_action(i)
        gobs, grew, gterm, gtrunc, _ = genv.step(a)
        state, obs, rew, term, trunc = step(state, jnp.asarray(a, jnp.float32), key)
        np.testing.assert_allclose(np.asarray(obs), gobs, atol=atol, err_msg=f"obs step {i}")
        np.testing.assert_allclose(float(rew), grew, atol=atol, err_msg=f"reward step {i}")
        assert bool(term) == bool(gterm), f"terminated mismatch at step {i}"
        if gterm or (i + 1) % 25 == 0:
            genv.reset(seed=i)
            state, _ = ours.reset(jax.random.fold_in(key, i))
            state = set_state(genv, state)


def test_pendulum_matches_gymnasium():
    env = envs.make("pendulum")
    from ppoc_tpu.envs.pendulum import PendulumState

    def set_state(genv, s):
        genv.state = np.array([0.7, -0.3])
        return PendulumState(jnp.float32(0.7), jnp.float32(-0.3), jnp.int32(0))

    rng = np.random.RandomState(0)
    actions = rng.uniform(-2, 2, size=(300, 1)).astype(np.float32)
    _rollout_match("Pendulum-v1", env, set_state, lambda i: actions[i])


def test_cartpole_matches_gymnasium():
    env = envs.make("cartpole")
    from ppoc_tpu.envs.cartpole import CartPoleState

    def set_state(genv, s):
        genv.state = np.array([0.01, -0.02, 0.03, 0.01], dtype=np.float64)
        return CartPoleState(
            jnp.float32(0.01), jnp.float32(-0.02), jnp.float32(0.03),
            jnp.float32(0.01), jnp.int32(0),
        )

    genv = gymnasium.make("CartPole-v1").unwrapped
    genv.reset(seed=0)
    state = set_state(genv, None)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(1)
    for i in range(200):
        a = int(rng.randint(2))
        gobs, grew, gterm, gtrunc, _ = genv.step(a)
        state, obs, rew, term, trunc = step(state, jnp.asarray([a], jnp.int32), key)
        np.testing.assert_allclose(np.asarray(obs), gobs, atol=1e-4)
        assert float(rew) == grew
        assert bool(term) == bool(gterm)
        if gterm:
            genv.reset(seed=i)
            state = set_state(genv, None)


def test_mountain_car_matches_gymnasium():
    env = envs.make("mountain_car")
    from ppoc_tpu.envs.mountain_car import MountainCarState

    genv = gymnasium.make("MountainCarContinuous-v0").unwrapped
    genv.reset(seed=0)

    def set_state():
        genv.state = np.array([-0.5, 0.0])
        return MountainCarState(jnp.float32(-0.5), jnp.float32(0.0), jnp.int32(0))

    state = set_state()
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(2)
    for i in range(300):
        # deliberately beyond [-1, 1]: the force clips but Gymnasium's
        # action penalty uses the RAW action
        a = rng.uniform(-2.5, 2.5, size=(1,)).astype(np.float32)
        gobs, grew, gterm, gtrunc, _ = genv.step(a)
        state, obs, rew, term, trunc = step(state, jnp.asarray(a), key)
        np.testing.assert_allclose(np.asarray(obs), gobs, atol=1e-5)
        np.testing.assert_allclose(float(rew), grew, atol=1e-5)
        assert bool(term) == bool(gterm)
        if gterm:
            genv.reset(seed=i)
            state = set_state()


def test_simple_env_semantics():
    """Mirror of src/env.c:15-33: +1 & terminate at s>=5, truncate at 15."""
    env = envs.make("simple")
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    assert float(obs[0]) == 0.0
    # actions are clipped to [-1, 1]: 5 steps of +2 -> s=5 -> terminated
    for i in range(5):
        state, obs, rew, term, trunc = env.step(state, jnp.asarray([2.0]), key)
    assert bool(term) and float(rew) == 1.0 and float(obs[0]) == 5.0
    # do-nothing policy truncates at step 15 with no reward
    state, obs = env.reset(key)
    for i in range(15):
        state, obs, rew, term, trunc = env.step(state, jnp.asarray([0.0]), key)
    assert bool(trunc) and not bool(term) and float(rew) == 0.0


def test_pendulum_truncates_at_horizon():
    env = envs.make("pendulum")
    key = jax.random.PRNGKey(0)
    state, _ = env.reset(key)
    step = jax.jit(env.step)
    for i in range(200):
        state, obs, rew, term, trunc = step(state, jnp.zeros((1,)), key)
    assert bool(trunc) and not bool(term)


def test_vector_autoreset():
    """Auto-reset swaps in a fresh obs where done; next_obs keeps the true
    successor (the GAE bootstrap source), as in src/ppo.cu:64-69."""
    env = envs.make("simple")
    key = jax.random.PRNGKey(0)
    state, obs = envs.vector_reset(env, key, 4)
    # drive two envs to termination (action +1 five times), two stay put
    act = jnp.array([[1.0], [1.0], [0.0], [0.0]])
    for i in range(5):
        state, obs, next_obs, rew, term, trunc = envs.vector_autoreset_step(
            env, state, act, jax.random.fold_in(key, i)
        )
    assert bool(term[0]) and bool(term[1]) and not bool(term[2])
    # done envs were reset: obs back to 0; next_obs shows the terminal state 5
    assert float(obs[0, 0]) == 0.0 and float(next_obs[0, 0]) == 5.0
    assert float(obs[2, 0]) == 0.0  # undone env just sits at 0 too (0 actions)
    # step counters reset for done envs
    assert int(state.t[0]) == 0 and int(state.t[2]) == 5


def test_acrobot_matches_gymnasium():
    """RK4 book dynamics vs gymnasium AcrobotEnv, identical states+actions."""
    env = envs.make("acrobot")
    from ppoc_tpu.envs.acrobot import AcrobotState

    genv = gymnasium.make("Acrobot-v1").unwrapped
    genv.reset(seed=0)

    def set_state(i):
        v = np.random.RandomState(i).uniform(-0.1, 0.1, 4)
        genv.state = v.astype(np.float64)
        return AcrobotState(jnp.asarray(v, jnp.float32), jnp.int32(0))

    state = set_state(0)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(3)
    for i in range(200):
        a = int(rng.randint(3))
        gobs, grew, gterm, gtrunc, _ = genv.step(a)
        state, obs, rew, term, trunc = step(state, jnp.asarray([a], jnp.int32), key)
        np.testing.assert_allclose(np.asarray(obs), gobs, atol=2e-3,
                                   err_msg=f"obs step {i}")
        assert float(rew) == grew
        assert bool(term) == bool(gterm), f"terminated mismatch at step {i}"
        if gterm or (i + 1) % 25 == 0:
            genv.reset(seed=i)
            state = set_state(i + 1)


def test_reacher_basic():
    """Reacher sanity: shapes, reward improves when moving toward target,
    horizon truncation."""
    env = envs.make("reacher")
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    assert obs.shape == (env.spec.obs_dim,)
    step = jax.jit(env.step)
    last = None
    for i in range(env.spec.horizon):
        state, obs, rew, term, trunc = step(state, jnp.zeros((2,)), key)
        last = (rew, term, trunc)
    rew, term, trunc = last
    assert bool(trunc) and not bool(term)
    # reward is -(distance + ctrl cost): bounded by the arm geometry
    assert -2.1 <= float(rew) <= 0.0


def test_reacher_learns_smoke():
    """A short PPO run improves mean reward (dense shaped task)."""
    from ppoc_tpu.algo.trainer import Trainer
    from ppoc_tpu.config import PPOConfig

    cfg = PPOConfig(env="reacher", n_envs=32, rollout_len=150,
                    minibatch_size=256, fits_per_epoch=2, n_epochs=3,
                    eval_envs=32, eval_len=150, hidden=(64, 64),
                    kernel_backend="jnp", seed=0)
    tr = Trainer(cfg)
    before = tr.evaluate()
    tr.train(log=False)
    after = tr.evaluate()
    assert after.R > before.R + 5.0  # clearly improving


def test_obs_norm_wrapper_lockstep():
    """mountain_car_norm: identical physics/rewards/flags to the raw env,
    observations affinely mapped into [-1, 1]."""
    import numpy as np

    from ppoc_tpu import envs
    from ppoc_tpu.envs import mountain_car as mc

    raw = envs.make("mountain_car")
    wrapped = envs.make("mountain_car_norm")
    key = jax.random.PRNGKey(0)
    s_r, o_r = raw.reset(key)
    s_w, o_w = wrapped.reset(key)
    lo = np.array([mc.MIN_POSITION, -mc.MAX_SPEED])
    hi = np.array([mc.MAX_POSITION, mc.MAX_SPEED])
    mid, half = (hi + lo) / 2, (hi - lo) / 2
    np.testing.assert_allclose(np.asarray(o_w), (np.asarray(o_r) - mid) / half,
                               rtol=1e-6, atol=1e-6)
    for t in range(50):
        a = jnp.asarray([0.7 if t % 3 else -1.0])
        s_r, o_r, r_r, te_r, tr_r = raw.step(s_r, a, key)
        s_w, o_w, r_w, te_w, tr_w = wrapped.step(s_w, a, key)
        assert float(r_r) == float(r_w)
        assert bool(te_r) == bool(te_w) and bool(tr_r) == bool(tr_w)
        np.testing.assert_allclose(
            np.asarray(o_w), (np.asarray(o_r) - mid) / half, rtol=1e-5, atol=1e-6)
        assert float(np.abs(np.asarray(o_w)).max()) <= 1.0 + 1e-5


def test_stack_obs_wrapper():
    """Frame stacking: window semantics, reset fill, auto-reset compat."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppoc_tpu import envs

    base = envs.make("pendulum_po")
    stacked = envs.make("pendulum_po_stack")
    assert stacked.spec.obs_dim == 4 * base.spec.obs_dim

    key = jax.random.PRNGKey(0)
    (st_b, _) = base.reset(key)[0], None
    st_s, obs0 = stacked.reset(key)
    # reset fills the window with the first frame
    np.testing.assert_array_equal(
        np.asarray(obs0).reshape(4, -1)[0], np.asarray(obs0).reshape(4, -1)[3])

    # stepping both in lockstep: the stacked env's newest frame equals the
    # base env's observation, and frames shift by one
    a = jnp.zeros((1,))
    k = jax.random.PRNGKey(1)
    st_b = base.reset(key)[0]
    prev = np.asarray(obs0).reshape(4, -1)
    for i in range(3):
        st_b, ob, *_ = base.step(st_b, a, k)
        st_s, os_, *_ = stacked.step(st_s, a, k)
        w = np.asarray(os_).reshape(4, -1)
        np.testing.assert_allclose(w[3], np.asarray(ob), rtol=1e-6)
        np.testing.assert_allclose(w[:3], prev[1:], rtol=1e-6)
        prev = w
