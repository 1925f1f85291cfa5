"""Negative paths: clear errors instead of silent misbehavior."""
import pytest

from ppoc_tpu import PPOConfig, envs


def test_unknown_env_lists_available():
    with pytest.raises(KeyError, match="pendulum"):
        envs.make("no_such_env")


def test_trainer_rejects_indivisible_sizes():
    from ppoc_tpu.algo.trainer import Trainer
    from ppoc_tpu.parallel import make_mesh

    cfg = PPOConfig(env="simple", n_envs=30, minibatch_size=64, eval_envs=64,
                    hidden=(16, 16))  # 30 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        Trainer(cfg, mesh=make_mesh())


def test_tp_rejects_indivisible_hidden():
    from ppoc_tpu.models import mlp
    from ppoc_tpu.parallel import tp
    import jax

    params = mlp.init(jax.random.PRNGKey(0), (3, 10, 1))  # 10 % 4 != 0
    with pytest.raises(AssertionError, match="tp"):
        tp.shard_params_all(params, 4)


def test_checkpoint_bad_magic(tmp_path):
    from ppoc_tpu.utils import checkpoint

    p = tmp_path / "bad.bin"
    p.write_bytes(b"XXXX" + b"\x00" * 64)
    with pytest.raises((ValueError, IOError)):
        checkpoint.load(str(p))


def test_unknown_activation():
    import jax
    import jax.numpy as jnp

    from ppoc_tpu.models import mlp

    params = mlp.init(jax.random.PRNGKey(0), (3, 8, 1))
    with pytest.raises(KeyError):
        mlp.apply(params, jnp.zeros((2, 3)), "swish", "jnp")
