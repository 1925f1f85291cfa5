"""Profiling + debug utilities."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppoc_tpu.utils import debug, profiling


def test_throughput_meter():
    m = profiling.ThroughputMeter()
    x = jnp.arange(1000.0)
    with m.section(500, sync_on=x):
        y = jnp.sum(x * 2)
    assert m.total_steps == 500
    assert m.total_seconds > 0
    assert m.steps_per_second > 0
    rep = m.report()
    assert rep["env_steps"] == 500.0


def test_sync_forces_completion():
    x = jnp.ones((8, 8))
    profiling.sync({"a": x, "b": [x * 2]})  # must not raise


def test_checked_clean_function():
    f = debug.checked(lambda x: jnp.sqrt(x) + 1.0)
    err, out = f(jnp.asarray([4.0, 9.0]))
    err.throw()  # no error
    np.testing.assert_allclose(np.asarray(out), [3.0, 4.0])


def test_checked_catches_nan():
    f = debug.checked(lambda x: jnp.log(x))  # log(-1) -> nan
    err, _ = f(jnp.asarray([-1.0]))
    with pytest.raises(Exception):
        err.throw()


def test_checked_on_fit_step():
    """The full jitted fit runs clean under checkify float checks."""
    from ppoc_tpu import envs
    from ppoc_tpu.algo import ppo
    from ppoc_tpu.config import PPOConfig

    cfg = PPOConfig(env="simple", n_envs=8, rollout_len=15, minibatch_size=16,
                    fits_per_epoch=1, hidden=(16, 16), kernel_backend="jnp")
    env = envs.make("simple")
    ts = ppo.init_train_state(cfg, env, jax.random.PRNGKey(0))
    f = debug.checked(functools.partial(ppo.fit_step, cfg, env, backend="jnp"))
    err, (ts2, metrics) = f(ts, jax.random.PRNGKey(1))
    err.throw()
    assert np.isfinite(float(metrics.value_loss))


def test_nan_guard_restores_config():
    before = bool(jax.config.jax_debug_nans)
    with debug.nan_guard(True):
        assert bool(jax.config.jax_debug_nans) is True
    assert bool(jax.config.jax_debug_nans) == before


def test_checkpoint_template_mismatch_raises(tmp_path):
    """A checkpoint saved under a different net shape fails loudly at load."""
    import jax

    from ppoc_tpu import PPOConfig, Trainer

    p = str(tmp_path / "m.bin")
    small = PPOConfig(env="simple", n_envs=8, rollout_len=15, minibatch_size=16,
                      fits_per_epoch=1, hidden=(16, 16), kernel_backend="jnp")
    Trainer(small).save(p)
    big = Trainer(small.replace(hidden=(32, 32)))
    with pytest.raises(ValueError, match="shape mismatch"):
        big.load(p)


def test_blob_checkpoint_loads_without_native(tmp_path, monkeypatch):
    """The CRC container must be readable by the pure-Python fallback."""
    import jax

    from ppoc_tpu import PPOConfig, Trainer, native

    if not native.available():
        pytest.skip("needs native lib to WRITE the blob container")
    cfg = PPOConfig(env="simple", n_envs=8, rollout_len=15, minibatch_size=16,
                    fits_per_epoch=1, hidden=(16, 16), kernel_backend="jnp")
    tr = Trainer(cfg)
    p = str(tmp_path / "m.bin")
    tr.save(p)
    monkeypatch.setattr(native, "available", lambda: False)
    tr2 = Trainer(cfg)
    tr2.load(p)  # must use _read_blob_python
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(tr.state), jax.device_get(tr2.state),
    )


def test_profiler_trace_writes_capture(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        x = jnp.arange(128.0)
        profiling.sync(jnp.sum(x * x))
    import os
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "profiler trace produced no capture files"
